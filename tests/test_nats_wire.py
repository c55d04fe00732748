"""NATS wire protocol end-to-end: first-party broker + client + bridge.

Round-1 verdict item 7: exercise bus subjects on a REAL NATS socket.
These tests run an actual TCP broker speaking the NATS text protocol and
verify pub/sub, wildcards, echo suppression, and two in-process buses
bridged through the socket.
"""
import json
import socket
import threading
import time

import pytest

from lameness_tpu.io.bus import MessageBus, NatsBridge
from lameness_tpu.io.nats_wire import (NatsClient, NatsServer,
                                       subject_matches)


@pytest.fixture()
def server():
    srv = NatsServer()
    srv.start()
    yield srv
    srv.stop()


def _wait(cond, timeout_s=5.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_subject_matching():
    assert subject_matches("video.uploaded", "video.uploaded")
    assert subject_matches("video.*", "video.uploaded")
    assert not subject_matches("video.*", "video.uploaded.extra")
    assert subject_matches("pipeline.>", "pipeline.yolo")
    assert subject_matches(">", "anything.at.all")
    assert not subject_matches("pipeline.>", "pipeline")
    assert not subject_matches("a.b", "a.c")


def test_pub_sub_roundtrip(server):
    a = NatsClient(f"nats://127.0.0.1:{server.port}").connect()
    b = NatsClient(f"nats://127.0.0.1:{server.port}").connect()
    got = []
    b.subscribe("video.uploaded", got.append)
    b.flush()                       # SUB processed before we publish
    a.publish("video.uploaded", {"video_id": "v1", "filename": "x.mp4"})
    assert _wait(lambda: got)
    assert got[0]["video_id"] == "v1"
    a.close(); b.close()


def test_wildcards_and_unsubscribe(server):
    a = NatsClient(f"nats://127.0.0.1:{server.port}").connect()
    got = []
    sid = a.subscribe("pipeline.>", got.append)
    a.flush()
    a.publish("pipeline.yolo", {"n": 1})
    a.publish("pipeline.sam3", {"n": 2})
    a.publish("video.uploaded", {"n": 3})       # must NOT match
    assert _wait(lambda: len(got) == 2)
    time.sleep(0.1)
    assert sorted(g["n"] for g in got) == [1, 2]
    a.unsubscribe(sid)
    a.flush()
    a.publish("pipeline.yolo", {"n": 4})
    a.flush()
    assert len(got) == 2
    a.close()


def test_echo_suppression(server):
    noecho = NatsClient(f"nats://127.0.0.1:{server.port}",
                        echo=False).connect()
    other = NatsClient(f"nats://127.0.0.1:{server.port}").connect()
    mine, theirs = [], []
    noecho.subscribe("x.y", mine.append)
    other.subscribe("x.y", theirs.append)
    noecho.flush(); other.flush()
    noecho.publish("x.y", {"from": "noecho"})
    assert _wait(lambda: theirs)                 # other client receives
    noecho.flush()
    assert mine == []                            # but not the publisher
    noecho.close(); other.close()


def test_two_buses_bridge_through_real_socket(server):
    """The verdict's 'done' condition: bus subjects observed on a real
    NATS socket — a publish on bus A is handled by a subscriber on bus B
    in another 'process' (separate bus + separate TCP connection)."""
    bus_a, bus_b = MessageBus(), MessageBus()
    subjects = ["video.uploaded", "pipeline.yolo", "analysis.complete"]
    seen_b, seen_a = [], []
    bus_b.subscribe_sync("video.uploaded",
                         lambda m: seen_b.append(m["video_id"]))
    bus_a.subscribe_sync("analysis.complete",
                         lambda m: seen_a.append(m["video_id"]))

    br_a = NatsBridge(bus_a, f"nats://127.0.0.1:{server.port}",
                      subjects=subjects)
    br_b = NatsBridge(bus_b, f"nats://127.0.0.1:{server.port}",
                      subjects=subjects)
    assert br_a.start() and br_b.start()
    br_a.flush(); br_b.flush()

    bus_a.publish_sync("video.uploaded", {"video_id": "va"})
    assert _wait(lambda: seen_b == ["va"])
    bus_b.publish_sync("analysis.complete", {"video_id": "vb"})
    assert _wait(lambda: seen_a == ["vb"])

    # no loops: each side saw each message exactly once
    time.sleep(0.2)
    assert seen_b == ["va"] and seen_a == ["vb"]
    assert bus_a.errors == [] and bus_b.errors == []
    assert server.messages_routed >= 2
    br_a.stop(); br_b.stop()


def test_bridge_degrades_when_no_server():
    bus = MessageBus()
    br = NatsBridge(bus, "nats://127.0.0.1:1")    # nothing listens there
    assert br.start() is False
    bus.publish_sync("video.uploaded", {"video_id": "v"})  # still works
    assert bus.errors == []


def test_raw_protocol_over_socket(server):
    """Speak the text protocol by hand — proves it's a real NATS socket,
    not an in-process shim."""
    s = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    f = s.makefile("rwb")
    info = f.readline()
    assert info.startswith(b"INFO ")
    assert json.loads(info[5:])["server_id"] == "lameness-nats"
    f.write(b'CONNECT {"verbose":true}\r\n'); f.flush()
    assert f.readline().strip() == b"+OK"
    f.write(b"SUB video.uploaded 9\r\n"); f.flush()
    assert f.readline().strip() == b"+OK"
    payload = b'{"video_id":"raw"}'
    f.write(b"PUB video.uploaded %d\r\n%s\r\n" % (len(payload), payload))
    f.flush()
    assert f.readline().strip() == b"+OK"
    msg = f.readline()
    assert msg.startswith(b"MSG video.uploaded 9 ")
    body = f.readline().strip()
    assert json.loads(body)["video_id"] == "raw"
    f.write(b"PING\r\n"); f.flush()
    assert f.readline().strip() == b"PONG"
    s.close()
