"""Rotating file egress — WriterFile semantics (reference
src/writer/WriterFile.cpp) as pure-file unit tests: mask grammar,
NUM/TIMESTAMP/SEQUENCE rotation, append resume, new-line dial, and the
mirror drain's exactly-once cursor."""

from __future__ import annotations

import json
import os

import pytest

from openlogreplicator_spark.sources.file_writer import (
    FileWriterConfigError,
    RotatingFileWriter,
    writer_from_plan,
)


# ---------------------------------------------------------------------------
# Mask grammar / config validation (WriterFile.cpp:79-135)
# ---------------------------------------------------------------------------

def test_unknown_percent_token_rejected(tmpdir_path):
    with pytest.raises(FileWriterConfigError, match="invalid value"):
        RotatingFileWriter(os.path.join(tmpdir_path, "out-%x.json"))


def test_no_rotate_requires_append(tmpdir_path):
    with pytest.raises(FileWriterConfigError, match="append"):
        RotatingFileWriter(os.path.join(tmpdir_path, "out.json"), append=0)


@pytest.mark.parametrize("mask", ["out-%i.json", "out-%t.json"])
def test_rotation_requires_max_file_size(tmpdir_path, mask):
    with pytest.raises(FileWriterConfigError, match="max file size"):
        RotatingFileWriter(os.path.join(tmpdir_path, mask))


def test_max_file_size_requires_output():
    with pytest.raises(FileWriterConfigError, match="output"):
        RotatingFileWriter("", max_file_size=100)


@pytest.mark.parametrize("bad", [{"new_line": 3}, {"append": 2}])
def test_dial_ranges(tmpdir_path, bad):
    with pytest.raises(FileWriterConfigError):
        RotatingFileWriter(os.path.join(tmpdir_path, "o.json"), **bad)


def test_writer_from_plan_only_when_rotation_asked(tmpdir_path):
    # plain file name, no max size -> distributed mirror stays the egress
    assert writer_from_plan(os.path.join(tmpdir_path, "out.json")) is None
    assert writer_from_plan("") is None
    w = writer_from_plan(os.path.join(tmpdir_path, "out-%i.json"),
                         max_file_size=100)
    assert w is not None and w.mode == "num"
    # max-file-size alone (no mask) also engages the single-file writer
    w2 = writer_from_plan(os.path.join(tmpdir_path, "out.json"),
                          max_file_size=100)
    assert w2 is not None and w2.mode == "no_rotate"


# ---------------------------------------------------------------------------
# NUM mode (WriterFile.cpp:210-230, resume scan :138-188)
# ---------------------------------------------------------------------------

def test_num_rotation_and_zero_fill(tmpdir_path):
    out = os.path.join(tmpdir_path, "o-%3i.json")
    with RotatingFileWriter(out, max_file_size=25, new_line=1) as w:
        for i in range(6):
            w.send_message(b"0123456789")  # 11 bytes with LF -> 2 per file
    names = sorted(os.listdir(tmpdir_path))
    assert names == ["o-000.json", "o-001.json", "o-002.json"]
    assert open(os.path.join(tmpdir_path, "o-000.json")).read() == (
        "0123456789\n0123456789\n")


def test_num_append_resumes_last_file(tmpdir_path):
    out = os.path.join(tmpdir_path, "o-%i.json")
    with RotatingFileWriter(out, max_file_size=100) as w:
        w.send_message(b"first")
    with RotatingFileWriter(out, max_file_size=100, append=1) as w:
        assert w.file_num == 0  # append=1: continue the highest number
        w.send_message(b"second")
    assert open(os.path.join(tmpdir_path, "o-0.json")).read() == "first\nsecond\n"


def test_num_no_append_starts_next_number(tmpdir_path):
    out = os.path.join(tmpdir_path, "o-%i.json")
    with RotatingFileWriter(out, max_file_size=100) as w:
        w.send_message(b"first")
    with RotatingFileWriter(out, max_file_size=100, append=0) as w:
        assert w.file_num == 1  # append=0: never touch existing files
        w.send_message(b"second")
    assert sorted(os.listdir(tmpdir_path)) == ["o-0.json", "o-1.json"]


# ---------------------------------------------------------------------------
# TIMESTAMP / SEQUENCE / NO_ROTATE
# ---------------------------------------------------------------------------

def test_timestamp_same_second_does_not_switch(tmpdir_path):
    out = os.path.join(tmpdir_path, "o-%t.json")
    with RotatingFileWriter(out, max_file_size=15) as w:
        w.send_message(b"0123456789")
        w.send_message(b"0123456789")  # would rotate, but same strftime name
        assert w._warned_rotate_early  # warning 60030 analog
    files = os.listdir(tmpdir_path)
    assert len(files) == 1 and files[0].startswith("o-")


def test_sequence_rotates_on_sequence_change(tmpdir_path):
    out = os.path.join(tmpdir_path, "o-%s.json")
    with RotatingFileWriter(out) as w:  # %s needs no max-file-size
        w.send_message(b"a", sequence=7)
        w.send_message(b"b", sequence=7)
        w.send_message(b"c", sequence=8)
    assert sorted(os.listdir(tmpdir_path)) == ["o-7.json", "o-8.json"]
    assert open(os.path.join(tmpdir_path, "o-7.json")).read() == "a\nb\n"


def test_no_rotate_appends_across_opens(tmpdir_path):
    out = os.path.join(tmpdir_path, "out.json")
    with RotatingFileWriter(out) as w:
        w.send_message(b"one")
    with RotatingFileWriter(out) as w:
        w.send_message(b"two")
    assert open(out).read() == "one\ntwo\n"


@pytest.mark.parametrize("nl,sep", [(0, b""), (1, b"\n"), (2, b"\r\n")])
def test_new_line_dial(tmpdir_path, nl, sep):
    out = os.path.join(tmpdir_path, "out.json")
    with RotatingFileWriter(out, new_line=nl) as w:
        w.send_message(b"x")
        w.send_message(b"y")
    assert open(out, "rb").read() == b"x" + sep + b"y" + sep


def test_stdout_mode_writes_stream():
    import io

    buf = io.BytesIO()
    w = RotatingFileWriter("", stream=buf)
    assert w.mode == "stdout"
    w.send_message(b"hello")
    assert buf.getvalue() == b"hello\n"


# ---------------------------------------------------------------------------
# Mirror drain: commit order + exactly-once cursor
# ---------------------------------------------------------------------------

def _fake_mirror(root, epochs):
    """epochs: {epoch_id: [line, ...]} split across two part files."""
    for eid, lines in epochs.items():
        d = os.path.join(root, f"epoch={eid:06d}")
        os.makedirs(d, exist_ok=True)
        half = len(lines) // 2
        for pno, chunk in ((0, lines[:half]), (1, lines[half:])):
            with open(os.path.join(d, f"part-{pno:05d}"), "w") as f:
                f.writelines(ln + "\n" for ln in chunk)
        with open(os.path.join(d, "zz-chkpt.json"), "w") as f:
            f.write(json.dumps({"scn": eid * 10,
                                "payload": [{"op": "chkpt", "seq": eid}]}) + "\n")


def test_drain_mirror_order_and_cursor(tmpdir_path):
    mirror = os.path.join(tmpdir_path, "mirror")
    _fake_mirror(mirror, {0: ["m0", "m1", "m2"], 1: ["m3", "m4"]})
    out = os.path.join(tmpdir_path, "out.json")
    with RotatingFileWriter(out) as w:
        n = w.drain_mirror(mirror)
    assert n == 7  # 5 messages + 2 chkpt heartbeats
    lines = open(out).read().splitlines()
    assert [ln for ln in lines if ln.startswith("m")] == [
        "m0", "m1", "m2", "m3", "m4"]

    # re-drain: cursor makes it a no-op
    with RotatingFileWriter(out) as w:
        assert w.drain_mirror(mirror) == 0
    # a NEW epoch drains incrementally
    _fake_mirror(mirror, {2: ["m5", "m6"]})
    with RotatingFileWriter(out) as w:
        assert w.drain_mirror(mirror) == 3
    lines = open(out).read().splitlines()
    assert [ln for ln in lines if ln.startswith("m")] == [
        "m0", "m1", "m2", "m3", "m4", "m5", "m6"]


def test_drain_mirror_sequence_mode_one_file_per_epoch(tmpdir_path):
    mirror = os.path.join(tmpdir_path, "mirror")
    _fake_mirror(mirror, {0: ["a", "b"], 1: ["c"]})
    out = os.path.join(tmpdir_path, "rot", "o-%s.json")
    with RotatingFileWriter(out) as w:
        w.drain_mirror(mirror)
    rot = sorted(os.listdir(os.path.join(tmpdir_path, "rot")))
    assert rot == ["o-0.json", "o-1.json"]
