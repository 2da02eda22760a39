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


TERM_ERR = (
    "26/08/15 12:00:02 ERROR MicroBatchExecution: Query [id = x] "
    "terminated with error"
)


def test_injected_crash_excuses_exactly_one_termination(tmp_path):
    """One sentinel line excuses exactly ONE MicroBatchExecution
    termination ERROR — even though the raise message is echoed several
    more times by the log line + traceback (r7 advisor: counting the
    message over-excused and could mask a real streaming failure)."""
    _run_guard(
        tmp_path,
        [
            "SPARK_GRAFT_INJECTED_CRASH",
            TERM_ERR,
            "RuntimeError: injected crash AFTER sink commit, BEFORE checkpoint",
            "  ... traceback echo: injected crash AFTER sink commit ...",
        ],
    )


def test_second_termination_not_excused_by_message_echoes(tmp_path):
    """The raise-message echoes must NOT widen the excusal budget: a
    second termination ERROR with only one sentinel is a real failure."""
    with pytest.raises(SystemExit):
        _run_guard(
            tmp_path,
            [
                "SPARK_GRAFT_INJECTED_CRASH",
                TERM_ERR,
                "RuntimeError: injected crash AFTER sink commit, BEFORE checkpoint",
                "more echo of injected crash AFTER sink commit here",
                TERM_ERR,
            ],
        )


def test_non_termination_error_never_excused(tmp_path):
    with pytest.raises(SystemExit):
        _run_guard(
            tmp_path,
            [
                "SPARK_GRAFT_INJECTED_CRASH",
                "26/08/15 12:00:03 ERROR Executor: Exception in task 0.0",
            ],
        )
