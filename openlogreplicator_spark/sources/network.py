"""W4 — network writer: the reference's redo-stream TCP protocol.

The reference's WriterStream (/root/reference/src/writer/
WriterStream.cpp:1-300) serves committed messages over a socket
(StreamNetwork, /root/reference/src/stream/StreamNetwork.cpp) with a
CLIENT-DRIVEN restart protocol: the client sends INFO to learn the
server's confirmed position, START(scn) to begin/resume, and CONFIRM
(c_scn) as it durably applies — on reconnect the stream resumes after the
confirmed position, giving the client at-least-once delivery with its own
dedup (or exactly-once if it confirms transactionally).

Here the same protocol over plain TCP (no ZMQ in this image — not
needed): 4-byte big-endian length-prefixed frames, each frame one
protobuf message from the reference's own schema
(proto/OraProtoBuf.proto: RedoRequest/RedoResponse), encoded by the
pure-Python wire format in functions/protobuf_output.py.

Division of labor at scale: Spark (distributed) builds + spools the
ordered message stream per epoch (``write_protobuf_mirror`` — same
(scn, idx) range-partitioned file layout as the JSON mirror); the server
is a DRIVER-SIDE tail over the spool, exactly like the reference's
single writer thread.  The socket was never the parallel part.
"""

from __future__ import annotations

import glob
import json
import os
import socket
import socketserver
import struct
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# consumer spool: frames per pyarrow row-group append — the driver-memory
# bound of replicate_from_stream (tests shrink it to force multi-row-group
# spools)
NET_SPOOL_BATCH = 4096

from ..functions.protobuf_output import (
    build_protobuf_messages,
    decode_message,
    field_string,
    field_varint,
)

# RequestCode / ResponseCode (OraProtoBuf.proto:143-163)
REQ_INFO, REQ_START, REQ_CONTINUE, REQ_CONFIRM = 0, 1, 2, 3
RESP_READY, RESP_FAILED_START, RESP_STARTING = 0, 1, 2
RESP_ALREADY_STARTED, RESP_REPLICATE, RESP_PAYLOAD = 3, 4, 5
RESP_INVALID_DATABASE, RESP_INVALID_COMMAND = 6, 7


def write_protobuf_mirror(
    committed_dml: DataFrame, out_dir: str, epoch_id: int | str,
    db_name: str = "transcripts_feed", owner: str = "APP",
    n_files: int | None = None,
    ddls: list[tuple] | None = None,
    fmt=None,
) -> None:
    """Spool one epoch of encoded RedoResponse messages as (scn, idx,
    message) parquet in global (scn, idx) order — the binary twin of
    ``write_json_mirror`` (same rotation/idempotence contract: one dir per
    epoch, overwritten whole on replay).

    ``ddls``: committed DDL as [(commit_scn, seq_in_txn, stmt)] —
    encoded as op=ddl payloads (Payload.ddl field 6, Op enum 5) and
    interleaved at their commit scn, so a chained protobuf consumer
    evolves its schema like the JSON chain.

    ``fmt``: optional :class:`~..functions.json_output.WireFormat` — the
    same per-job format dials the JSON egress honors; the protobuf wire
    reads its MESSAGE_FORMAT::FULL bit (one multi-payload RedoResponse
    per transaction, BuilderProtobuf's FULL branch analog).  Other dials
    are JSON header shapes with no protobuf field, so they don't apply."""
    from ..functions.json_output import MSG_FULL
    from ..functions.protobuf_output import encode_payload, encode_redo_response

    full_txn = bool(fmt is not None and fmt.message & MSG_FULL)
    msgs = build_protobuf_messages(
        committed_dml, db_name=db_name, owner=owner, full_txn=full_txn)
    spark = committed_dml.sparkSession
    if ddls:
        rows = [
            (
                int(scn),
                int(idx),
                encode_redo_response(
                    int(scn), 0, f"ddl@{int(scn)}", db_name,
                    [encode_payload("ddl", owner, None, None, None, None,
                                    ddl=stmt)],
                ),
            )
            for scn, idx, stmt in ddls
        ]
        msgs = msgs.unionByName(
            spark.createDataFrame(rows, "scn long, idx int, message binary")
        )
    n = n_files or spark.sparkContext.defaultParallelism
    # repartitionByRange samples its input for range bounds — without a
    # cache that is a SECOND full pass through the Python encoder (the
    # mapInPandas plan is opaque, nothing prunes).  Persist the encoded
    # frames for the duration of the write so encode runs once (guide
    # §4.1/§1.2); serialized storage, dropped as soon as the files land.
    from pyspark import StorageLevel

    msgs = msgs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            msgs.repartitionByRange(n, "scn", "idx")
            .sortWithinPartitions("scn", "idx")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch={int(epoch_id):06d}"))
        )
    finally:
        msgs.unpersist()


def read_spool_messages(out_dir: str, after_scn: int = 0):
    """Driver-side ordered tail over the spool: epochs ascending, part
    files lexicographic, rows in stored order; yields (scn, idx, bytes)
    with scn > after_scn.  pyarrow, no Spark job."""
    import pyarrow.parquet as pq

    for epoch_dir in sorted(glob.glob(os.path.join(out_dir, "epoch=*"))):
        parts = sorted(
            p for p in glob.glob(os.path.join(epoch_dir, "part-*"))
            if p.endswith(".parquet")
        )
        for p in parts:
            t = pq.read_table(p, columns=["scn", "idx", "message"])
            for scn, idx, msg in zip(
                t["scn"].to_pylist(), t["idx"].to_pylist(), t["message"].to_pylist()
            ):
                if scn > after_scn:
                    yield scn, idx, msg


def _prom_registry():
    """Active Prometheus registry or None — messages_sent/bytes_sent and
    the confirm counters (metrics.adoc) hook here, driver-side."""
    from ..streaming.prometheus import get_registry

    return get_registry()


def _send_frame(sock, payload: bytes):
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _recv_frame(sock) -> bytes | None:
    hdr = b""
    while len(hdr) < 4:
        c = sock.recv(4 - len(hdr))
        if not c:
            return None
        hdr += c
    (n,) = struct.unpack(">I", hdr)
    buf = b""
    while len(buf) < n:
        c = sock.recv(n - len(buf))
        if not c:
            return None
        buf += c
    return buf


def _encode_control(code: int, scn: int | None = None) -> bytes:
    body = field_varint(1, code, keep_zero=True)
    if scn is not None:
        body += field_varint(2, scn, keep_zero=True)
    return body


class RedoStreamServer:
    """The WriterStream analog: serve the spooled message stream with the
    INFO/START/CONFIRM protocol; the confirmed position persists in a
    checkpoint file so client restarts resume exactly where they left off
    (reference: confirmed scn chain, Writer.cpp:362-399)."""

    def __init__(self, spool_dir: str, db_name: str = "transcripts_feed",
                 host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        self.db_name = db_name
        self.chkpt_path = os.path.join(spool_dir, "confirmed.json")
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                outer._serve(self.request)

        self._srv = socketserver.ThreadingTCPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    # ------------------------------------------------------------- lifecycle
    def start(self) -> tuple[str, int]:
        self._thread.start()
        return self._srv.server_address

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()

    # ------------------------------------------------------------ checkpoint
    def confirmed_scn(self) -> int:
        try:
            with open(self.chkpt_path) as f:
                return int(json.load(f)["c_scn"])
        except (OSError, ValueError, KeyError):
            return 0

    def _record_confirm(self, scn: int):
        tmp = self.chkpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"c_scn": int(scn)}, f)
        os.replace(tmp, self.chkpt_path)

    # -------------------------------------------------------------- protocol
    def _serve(self, sock):
        while True:
            frame = _recv_frame(sock)
            if frame is None:
                return
            req = decode_message(frame)
            code = req.get(1, [0])[0]
            db = req.get(2, [b""])[0].decode("utf-8") if 2 in req else ""
            if db and db != self.db_name:
                _send_frame(sock, _encode_control(RESP_INVALID_DATABASE))
                continue
            if code == REQ_INFO:
                _send_frame(
                    sock,
                    _encode_control(RESP_READY, scn=self.confirmed_scn()),
                )
            elif code == REQ_START:
                start_scn = req.get(3, [0])[0] if 3 in req else self.confirmed_scn()
                _send_frame(sock, _encode_control(RESP_STARTING, scn=start_scn))
                reg = _prom_registry()
                n_msgs = n_bytes = 0
                for scn, idx, msg in read_spool_messages(self.spool_dir, start_scn):
                    # stamp the confirm coordinates (c_scn/c_idx fields 10/11)
                    out = msg + field_varint(10, scn) + field_varint(11, idx)
                    _send_frame(sock, out)
                    n_msgs += 1
                    n_bytes += len(out) + 4
                if reg is not None:
                    reg.inc("messages_sent", n_msgs)
                    reg.inc("bytes_sent", n_bytes)
                # spool drained: tell the client it is at the live edge
                _send_frame(sock, _encode_control(RESP_REPLICATE))
            elif code == REQ_CONFIRM:
                c_scn = req.get(8, [0])[0] if 8 in req else req.get(3, [0])[0]
                if c_scn > self.confirmed_scn():
                    reg = _prom_registry()
                    if reg is not None:
                        # confirmed frontier advanced: count the spool
                        # messages (and their wire bytes) now acknowledged
                        for _s, _i, m in read_spool_messages(
                                self.spool_dir, self.confirmed_scn()):
                            if _s <= c_scn:
                                reg.inc("messages_confirmed", 1)
                                reg.inc("bytes_confirmed", len(m) + 4)
                    self._record_confirm(c_scn)
            else:
                _send_frame(sock, _encode_control(RESP_INVALID_COMMAND))


# ------------------------------------------------------------------- client
def encode_request(code: int, db_name: str, scn: int | None = None,
                   c_scn: int | None = None) -> bytes:
    body = field_varint(1, code, keep_zero=True)
    body += field_string(2, db_name)
    if scn is not None:
        body += field_varint(3, scn, keep_zero=True)
    if c_scn is not None:
        body += field_varint(8, c_scn, keep_zero=True)
    return body


class RedoStreamClient:
    """Test/consumer client: INFO → START(resume point) → iterate payload
    frames, confirming as it applies."""

    def __init__(self, host: str, port: int, db_name: str):
        self.sock = socket.create_connection((host, port))
        self.db_name = db_name

    def info(self) -> int:
        _send_frame(self.sock, encode_request(REQ_INFO, self.db_name))
        resp = decode_message(_recv_frame(self.sock))
        assert resp.get(1, [RESP_READY])[0] == RESP_READY
        return resp.get(2, [0])[0] if 2 in resp else 0

    def stream(self, start_scn: int):
        """Yield decoded RedoResponse field-maps until the live edge."""
        for _scn, _idx, frame in self.stream_raw(start_scn):
            yield decode_message(frame)

    def stream_raw(self, start_scn: int):
        """Yield ``(c_scn, c_idx, frame_bytes)`` payload frames until the
        live edge — the raw tap ``replicate_from_stream`` re-parses with
        the protobuf ingress.  The confirm coordinates are the
        server-stamped fields 10/11 (last occurrence wins, proto3 rule)."""
        _send_frame(self.sock, encode_request(REQ_START, self.db_name, scn=start_scn))
        starting = decode_message(_recv_frame(self.sock))
        assert starting.get(1, [None])[0] == RESP_STARTING
        while True:
            frame = _recv_frame(self.sock)
            if frame is None:
                return
            msg = decode_message(frame)
            if msg.get(1, [None])[0] == RESP_REPLICATE and 9 not in msg:
                return
            yield msg.get(10, [0])[-1], msg.get(11, [0])[-1], frame

    def confirm(self, c_scn: int):
        _send_frame(
            self.sock, encode_request(REQ_CONFIRM, self.db_name, c_scn=c_scn)
        )

    def close(self):
        self.sock.close()


def replicate_from_stream(
    spark,
    host: str,
    port: int,
    db_name: str,
    table_path: str,
    job_id: str = "netchain",
    chunk_frames: int = 100_000,
    image_type=None,
    tracked_pattern: str = "^transcripts$",
    multi: bool = False,
    **apply_kwargs,
):
    """W4 consumer side: drain a RedoStreamServer into a replica
    LakeTable — the full client loop the reference documents for its
    network writer (WriterStream.cpp confirm chain + StreamNetwork.cpp).

    Contract: delivery is at-least-once from the last CONFIRMed scn; the
    consumer owns exactly-once, as the reference requires of its stream
    clients (WriterStream confirm chain).  Two replica-side mechanisms,
    both anchored in the lake manifest (durable, atomic with the data):

    * each chunk's EPOCH ID IS its max commit scn (a drain-counter id
      would be WRONG: a second drain would reuse already-ledgered ids
      for different data and the ledger would silently swallow it);
    * the APPLIED FRONTIER = max ledgered chunk id: chunks apply in scn
      order and the mark commits atomically with the merge, so every
      frame at or below the frontier is already in the table —
      re-delivered frames ≤ frontier are dropped BEFORE applying.
      Without this filter a confirm-file rewind/wipe re-delivers old
      frames under NEW chunk cuts (new ids, ledger blind) and stale ops
      would overwrite newer table state.

    CONFIRM is sent only AFTER the chunk's merge committed; a drain that
    finds the server's confirm behind the replica frontier (rewound or
    wiped checkpoint) re-CONFIRMs the frontier to heal it.

    Scale shape: the socket is the serial part by design (the
    reference's writer is one thread; the stream IS a total order).
    Frames SPOOL to a local parquet file as they arrive (pyarrow row
    groups of ~4k frames) and each chunk of ``chunk_frames`` is applied
    as one distributed epoch by handing Spark the spool PATH — driver
    memory is O(row-group buffer), never O(chunk bytes) (round-4 review
    item: the old list buffer held up to chunk_frames raw frames).
    Chunks only cut at commit-scn boundaries so a transaction's ops
    never split across epochs.  Returns {start_scn, frames, epochs}.

    ``multi=True``: ``table_path`` is a CATALOG path — frames route to
    per-table LakeTables via the payload schema (apply_epoch_multi), DDL
    frames (incl. CREATE/DROP TABLE) evolve the replica registry, and
    ``apply_kwargs`` (e.g. auto_register=True) pass through.
    """
    from pyspark.sql import functions as F

    from ..sources.protobuf_feed import parse_protobuf_messages

    if multi:
        from ..lake.catalog import Catalog
        from ..streaming.multi import apply_epoch_multi
    else:
        from ..lake.table import LakeTable
        from ..streaming.apply import apply_epoch

        table = LakeTable(spark, table_path)

    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    spool_schema = pa.schema(
        [
            pa.field("scn", pa.int64()),
            pa.field("idx", pa.int32()),
            pa.field("message", pa.binary()),
        ]
    )
    spool_dir = tempfile.mkdtemp(prefix="olr-netspool-")

    client = RedoStreamClient(host, port, db_name)
    try:
        start = client.info()
        done = (Catalog(spark, table_path) if multi else table).committed_epochs(
            job_id
        )
        frontier = max(done, default=0)  # replica-side applied watermark
        pend: list[tuple] = []  # ≤ SPOOL_BATCH frames awaiting a row group
        writer = None
        spool_path = None
        n_chunk = 0  # frames in the current (open) chunk
        chunk_no = 0
        chunk_max_scn = 0  # chunk identity = max commit scn seen
        last_scn = None
        applied, n_epochs = 0, 0

        def drain_pend():
            nonlocal writer, pend, spool_path
            if not pend:
                return
            if writer is None:
                spool_path = os.path.join(spool_dir, f"chunk-{chunk_no:06d}.parquet")
                writer = pq.ParquetWriter(spool_path, spool_schema)
            writer.write_table(
                pa.table(
                    {
                        "scn": [r[0] for r in pend],
                        "idx": [r[1] for r in pend],
                        "message": [r[2] for r in pend],
                    },
                    schema=spool_schema,
                )
            )
            pend = []

        def flush():
            nonlocal writer, spool_path, n_chunk, chunk_no, chunk_max_scn
            nonlocal applied, n_epochs
            drain_pend()
            if writer is None:
                return
            writer.close()
            writer = None
            ep = chunk_max_scn
            df = spark.read.parquet(spool_path).withColumn(
                "seq", F.lit(ep).cast("long")
            )
            events = parse_protobuf_messages(df, image_type)
            if multi:
                apply_epoch_multi(Catalog(spark, table_path), events, ep,
                                  job_id=job_id, **apply_kwargs)
            else:
                apply_epoch(table.refresh(), events, ep, job_id=job_id,
                            tracked_pattern=tracked_pattern, **apply_kwargs)
            client.confirm(ep)
            os.remove(spool_path)  # merge committed; the spool is consumed
            spool_path = None
            applied += n_chunk
            n_chunk, chunk_max_scn = 0, 0
            chunk_no += 1
            n_epochs += 1

        for c_scn, c_idx, frame in client.stream_raw(start):
            if c_scn <= frontier:
                continue  # re-delivered frame, already merged (see above)
            # cut only at a commit-scn boundary: txn groups stay whole
            if n_chunk >= chunk_frames and last_scn != c_scn:
                flush()
            pend.append((int(c_scn), int(c_idx), frame))
            n_chunk += 1
            chunk_max_scn = max(chunk_max_scn, int(c_scn))
            last_scn = c_scn
            if len(pend) >= NET_SPOOL_BATCH:
                drain_pend()
        flush()
        if applied == 0 and frontier > start:
            client.confirm(frontier)  # heal a rewound/wiped server confirm
        return {"start_scn": start, "frames": applied, "epochs": n_epochs}
    finally:
        client.close()
        shutil.rmtree(spool_dir, ignore_errors=True)
