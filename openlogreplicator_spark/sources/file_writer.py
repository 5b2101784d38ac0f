"""Rotating file egress — the reference's WriterFile semantics.

Reference: src/writer/WriterFile.cpp:1-340 (mask parse :70-190, rotation
:203-270, open/append :272-300, sendMessage/new-line :302-315) and the
config vocabulary src/OpenLogReplicator.cpp:1135-1175.

Architecture split (Spark-first): the DISTRIBUTED mirror
(functions/json_output.write_json_mirror) is the scale path — messages
range-partitioned by (scn, idx) so lexicographic (file, line) order is
commit order; that is what a 1000-executor job writes.  The reference's
file writer, by contrast, is a single sequential thread appending to ONE
current file with size/timestamp/sequence rotation — semantics users'
downstream tooling (tail -F, logrotate-style pickup, per-redo-log file
naming) depends on.  This module reproduces those semantics exactly as a
SERIAL TAIL of the mirror: the message stream is already a total order,
so draining it through one writer is the same O(stream) the reference
pays on its writer thread, with O(1) memory (line iterator, no collect).

Mask grammar (WriterFile.cpp:79-131):

* ``%i``            NUM mode, no zero fill
* ``%2i`` .. ``%10i``  NUM mode, zero-filled to that width
* ``%t``            TIMESTAMP mode (strftime of ``timestamp-format``,
                    default ``%F_%T``)
* ``%s``            SEQUENCE mode — rotates when the redo-log sequence
                    changes (here: the mirror epoch id, the engine's log
                    sequence analog; the chkpt heartbeat carries it)
* no ``%``          NO_ROTATE — ``append`` must be 1 (error 30006)
* any other ``%``   configuration error (30005)

NUM/TIMESTAMP require ``max-file-size`` (error 30007).  NUM resumes from
the highest existing numbered file (append=1) or the next free number
(append=0) — WriterFile.cpp:138-188.  ``new-line``: 0 none, 1 LF, 2 CRLF,
appended per message and counted against the size budget.  Empty
``output`` writes to stdout (MODE::STDOUT).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from collections.abc import Iterable


class FileWriterConfigError(ValueError):
    """Reference ConfigurationException 30005/30006/30007 analogs."""


_NUM_MASK = re.compile(r"%(10|[2-9])?i")


def _count_sent(n: int, nbytes: int) -> None:
    """Fold a send batch into the Prometheus registry (messages_sent /
    bytes_sent; a file write is immediately durable so confirmed == sent —
    the reference's WriterFile confirms on write the same way)."""
    if not n:
        return
    from ..streaming.prometheus import get_registry

    reg = get_registry()
    if reg is not None:
        reg.inc("messages_sent", n)
        reg.inc("bytes_sent", nbytes)
        reg.inc("messages_confirmed", n)
        reg.inc("bytes_confirmed", nbytes)


class RotatingFileWriter:
    """Serial rotating-file sink with WriterFile's exact dial semantics."""

    def __init__(
        self,
        output: str = "",
        timestamp_format: str = "%F_%T",
        max_file_size: int = 0,
        new_line: int = 1,
        append: int = 1,
        stream=None,
    ):
        if new_line not in (0, 1, 2):
            raise FileWriterConfigError(
                f'bad JSON, invalid "new-line" value: {new_line}, expected: '
                "one of {0 .. 2}")
        if append not in (0, 1):
            raise FileWriterConfigError(
                f'bad JSON, invalid "append" value: {append}, expected: one '
                "of {0, 1}")
        if max_file_size and not output:
            raise FileWriterConfigError(
                'bad JSON, invalid "output" value: , expected: to be set '
                f'when "max-file-size" is set ({max_file_size})')
        self.output = output
        self.timestamp_format = timestamp_format
        self.max_file_size = int(max_file_size)
        self.new_line = new_line
        self.append = append
        self._nl = (b"", b"\n", b"\r\n")[new_line]
        self._fh = None
        self._file_size = 0
        self._full_name: str | None = None
        self._warned_rotate_early = False
        self._warned_oversize = False
        self._last_sequence: int | None = None
        self._stream = stream  # test hook standing in for stdout

        if not output:
            self.mode = "stdout"
            self.path_name, self.mask = "", ""
            self.prefix = self.suffix = ""
            return

        self.path_name, _, self.mask = output.rpartition("/")
        self.path_name = self.path_name or "."

        m = _NUM_MASK.search(self.mask)
        if m is not None:
            self.mode = "num"
            self.fill = int(m.group(1)) if m.group(1) else 0
            self.prefix, self.suffix = self.mask[: m.start()], self.mask[m.end():]
        elif "%t" in self.mask:
            self.mode = "timestamp"
            i = self.mask.index("%t")
            self.prefix, self.suffix = self.mask[:i], self.mask[i + 2:]
        elif "%s" in self.mask:
            self.mode = "sequence"
            i = self.mask.index("%s")
            self.prefix, self.suffix = self.mask[:i], self.mask[i + 2:]
        elif "%" in self.mask:
            raise FileWriterConfigError(
                f"invalid value for 'output': {output}")
        else:
            if append == 0:
                raise FileWriterConfigError(
                    f"output file is with no rotation: {output} - 'append' "
                    "must be set to 1")
            self.mode = "no_rotate"
            self.prefix = self.suffix = ""

        if self.mode in ("num", "timestamp") and self.max_file_size == 0:
            raise FileWriterConfigError(
                f"output file is with no max file size: {output} - "
                "'max-file-size' must be defined for output with rotation")

        self.file_num = 0
        if self.mode == "num":
            # resume from existing numbered files (WriterFile.cpp:138-188)
            for name in os.listdir(self.path_name) if os.path.isdir(self.path_name) else []:
                if not (name.startswith(self.prefix) and name.endswith(self.suffix)):
                    continue
                mid = name[len(self.prefix): len(name) - len(self.suffix)]
                if not mid.isdigit():
                    continue
                n = int(mid)
                if self.append > 0:
                    self.file_num = max(self.file_num, n)
                else:
                    if self.file_num <= n:
                        self.file_num = n + 1

    # -- file lifecycle -----------------------------------------------------

    def _close_current(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def _open(self, full_name: str) -> None:
        exists = os.path.exists(full_name)
        if exists and self.append == 0:
            # reference raises 10003 rather than clobbering data
            raise FileExistsError(
                f"file: {full_name} - exists and append is 0")
        os.makedirs(os.path.dirname(full_name) or ".", exist_ok=True)
        self._fh = open(full_name, "ab")
        self._file_size = os.path.getsize(full_name) if exists else 0
        self._full_name = full_name

    def _strftime_name(self) -> str:
        # %F/%T are glibc shorthands Python also accepts via strftime on
        # most platforms; expand portably anyway
        fmt = (self.timestamp_format
               .replace("%F", "%Y-%m-%d").replace("%T", "%H:%M:%S"))
        return self.prefix + time.strftime(fmt) + self.suffix

    def _check_file(self, size: int, sequence: int | None) -> None:
        """checkFile (WriterFile.cpp:203-270): pick/rotate the target."""
        if self.mode == "stdout":
            return
        if self.mode == "no_rotate":
            if self._fh is None:
                self._open(os.path.join(self.path_name, self.mask))
            return
        if self.mode == "num":
            if self._fh is not None and self._file_size + size > self.max_file_size:
                self._close_current()
                self.file_num += 1
                self._file_size = 0
            if size > self.max_file_size and not self._warned_oversize:
                self._warned_oversize = True  # warning 60029 analog
            if self._fh is None:
                num = str(self.file_num)
                num = "0" * max(0, self.fill - len(num)) + num
                self._open(os.path.join(self.path_name, self.prefix + num + self.suffix))
            return
        if self.mode == "timestamp":
            should_switch = (
                self._fh is not None
                and self._file_size + size > self.max_file_size
            )
            if self._fh is None or should_switch:
                new_name = os.path.join(self.path_name, self._strftime_name())
                if new_name == self._full_name:
                    # same second — rotation size too low (warning 60030)
                    self._warned_rotate_early = True
                    should_switch = False
                elif should_switch:
                    self._close_current()
                    self._file_size = 0
                    self._open(new_name)
                    return
                if self._fh is None:
                    self._open(new_name)
            return
        # sequence mode: rotate whenever the redo sequence changes
        if sequence is not None and sequence != self._last_sequence:
            if self._last_sequence is not None:
                self._close_current()
                self._file_size = 0
            self._last_sequence = sequence
        if self._fh is None:
            seq = self._last_sequence if self._last_sequence is not None else 0
            self._open(os.path.join(self.path_name, f"{self.prefix}{seq}{self.suffix}"))

    # -- message interface ----------------------------------------------------

    def send_message(self, data: bytes | str, sequence: int | None = None) -> None:
        """sendMessage (WriterFile.cpp:302-315): write one message + the
        new-line dial, rotating first if the budget would overflow."""
        if isinstance(data, str):
            data = data.encode("utf-8")
        self._check_file(len(data) + len(self._nl), sequence)
        if self.mode == "stdout":
            out = self._stream or sys.stdout.buffer
            out.write(data + self._nl)
            return
        self._fh.write(data)
        self._fh.write(self._nl)
        self._file_size += len(data) + len(self._nl)

    def send_all(self, messages: Iterable[bytes | str],
                 sequence: int | None = None) -> int:
        n = 0
        nbytes = 0
        for m in messages:
            self.send_message(m, sequence=sequence)
            n += 1
            nbytes += len(m) if isinstance(m, bytes) else len(m.encode("utf-8"))
        _count_sent(n, nbytes)
        return n

    def flush(self) -> None:
        if self._fh is not None:
            self._fh.flush()

    def close(self) -> None:
        self._close_current()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- mirror tail ----------------------------------------------------------

    def drain_mirror(self, mirror_dir: str, state_path: str | None = None) -> int:
        """Tail the distributed JSON mirror into the rotated file(s).

        Epoch directories are consumed in ascending order; within one, part
        files lexicographically, lines in order — that IS commit order by
        the mirror's range-partition contract.  ``state_path`` (default
        ``<mirror>/.writer-pos``) persists the last fully-drained epoch so
        restarts resume exactly once — the file-writer half of the
        confirmed-position protocol (Writer.cpp confirmMessage analog).
        The zz-chkpt.json heartbeat closes each epoch and carries the
        epoch id, which is the rotation key in %s mode.  Returns the
        number of messages written."""
        state_path = state_path or os.path.join(mirror_dir, ".writer-pos")
        done = -1
        if os.path.exists(state_path):
            with open(state_path) as f:
                done = json.load(f)["epoch"]
        n = 0
        nbytes = 0
        for epoch_dir in sorted(glob.glob(os.path.join(mirror_dir, "epoch=*"))):
            epoch = int(os.path.basename(epoch_dir).split("=")[1])
            if epoch <= done:
                continue
            for path in sorted(glob.glob(os.path.join(epoch_dir, "*"))):
                name = os.path.basename(path)
                if not (name.startswith("part-") or name == "zz-chkpt.json"):
                    continue
                with open(path, "rb") as f:
                    for line in f:
                        line = line.rstrip(b"\n")
                        if line:
                            self.send_message(line, sequence=epoch)
                            n += 1
                            nbytes += len(line)
            self.flush()
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch}, f)
            os.replace(tmp, state_path)
        _count_sent(n, nbytes)
        return n


def writer_from_plan(output: str, *, timestamp_format: str = "%F_%T",
                     max_file_size: int = 0, new_line: int = 1,
                     append: int = 1) -> RotatingFileWriter | None:
    """A rotating writer when the config asks for one — i.e. the output
    carries a rotation mask or a max-file-size — else None (the plain
    mirror-directory egress stays the default Spark-native shape)."""
    if not output:
        return None
    mask = os.path.basename(output)
    if "%" not in mask and not max_file_size:
        return None
    return RotatingFileWriter(
        output, timestamp_format=timestamp_format,
        max_file_size=max_file_size, new_line=new_line, append=append)
