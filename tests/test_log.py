"""Logger singleton (utils/log.py): the process-wide logger must RETARGET
its file handler when a new run asks for a different train.log — the r3
in-suite failure class: run A (any earlier run_train in the process)
attaches a FileHandler, then run B's lines land in A's file and B's
asserted train.log never exists."""

import logging
import os


def test_get_logger_retargets_file_handler(tmp_path):
    from heltondetection_tpu.utils.log import get_logger

    name = "heltondetection.test_log"   # isolated singleton for this test
    f1 = str(tmp_path / "run1" / "train.log")
    f2 = str(tmp_path / "run2" / "train.log")

    log = get_logger(name, log_file=f1)
    log.info("line-in-run1")
    log = get_logger(name, log_file=f2)   # second run in the same process
    log.info("line-in-run2")

    assert "line-in-run1" in open(f1).read()
    run2 = open(f2).read()
    assert "line-in-run2" in run2 and "line-in-run1" not in run2
    # run 1's file must NOT receive run 2's lines (the bug)
    assert "line-in-run2" not in open(f1).read()

    # same path requested again: no duplicate handler (no doubled lines)
    log = get_logger(name, log_file=f2)
    log.info("once-only")
    assert open(f2).read().count("once-only") == 1
    assert sum(isinstance(h, logging.FileHandler)
               for h in log.handlers) == 1

    # log_file=None (non-rank-0 path) keeps the current file handler
    log = get_logger(name)
    log.info("still-goes-to-run2")
    assert "still-goes-to-run2" in open(f2).read()

    for h in list(log.handlers):
        log.removeHandler(h)
        h.close()
