"""Structured JSON-lines logging."""
import json
import logging

from lameness_tpu.utils.logging import JsonFormatter, get_logger


def _capture(logger_name="lameness"):
    records = []

    class Sink(logging.Handler):
        def emit(self, record):
            records.append(JsonFormatter().format(record))

    h = Sink()
    logging.getLogger(logger_name).addHandler(h)
    return records, h


def test_events_are_json_lines():
    records, h = _capture()
    try:
        log = get_logger("testsvc")
        log.info("stage.complete", video_id="v1", seconds=1.25)
        assert len(records) == 1
        obj = json.loads(records[0])
        assert obj["event"] == "stage.complete"
        assert obj["service"] == "lameness.testsvc"
        assert obj["video_id"] == "v1" and obj["seconds"] == 1.25
        assert obj["level"] == "info" and "ts" in obj
    finally:
        logging.getLogger("lameness").removeHandler(h)


def test_error_carries_exception_repr():
    records, h = _capture()
    try:
        log = get_logger("testsvc2")
        try:
            raise ValueError("boom")
        except ValueError as e:
            log.error("stage.failed", exc=e, video_id="v2")
        obj = json.loads(records[-1])
        assert obj["level"] == "error"
        assert "ValueError" in obj["exc"]
    finally:
        logging.getLogger("lameness").removeHandler(h)


def test_non_serialisable_fields_stringified():
    records, h = _capture()
    try:
        get_logger("testsvc3").info("x", path=__import__("pathlib").Path("/a"))
        obj = json.loads(records[-1])
        assert obj["path"] == "/a"
    finally:
        logging.getLogger("lameness").removeHandler(h)
