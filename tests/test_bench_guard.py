"""bench.py's ERROR-stack guard (VERDICT r3 #4): a JVM-side ERROR line in
the captured stderr must turn the bench run into a loud failure; plain
WARN chatter must not."""

import os

import pytest

import bench


def _run_guard(tmp_path, lines):
    path = str(tmp_path / "stderr.log")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    devnull = os.open(os.devnull, os.O_WRONLY)
    try:
        bench._check_stderr(devnull, path)
    finally:
        os.close(devnull)


def test_warn_lines_pass(tmp_path):
    _run_guard(
        tmp_path,
        [
            "26/08/14 12:00:00 WARN NativeCodeLoader: ...",
            "[Stage 1:> (0 + 1) / 1]",
        ],
    )


def test_error_lines_fail(tmp_path):
    with pytest.raises(SystemExit):
        _run_guard(
            tmp_path,
            [
                "26/08/14 12:00:00 WARN something benign",
                "26/08/14 12:00:01 ERROR Executor: Exception in task 0.0",
                "java.io.IOException: boom",
            ],
        )
