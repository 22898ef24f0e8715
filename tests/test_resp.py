"""RESP2 wire layer: protocol frames, client/server command surface, and —
the point — the full S4/S5 connector + D4-D7 ack engine running over a real
TCP socket (executor processes connect to the driver-hosted listener), the
exact code path a redis:// deployment runs when redis-py is absent."""

from __future__ import annotations

import pytest

from sea_streamer_spark.streaming.fake_redis import FakeRedis, ResponseError
from sea_streamer_spark.streaming.resp import RespClient, encode_command, read_reply
from sea_streamer_spark.streaming.resp_server import RespServer


@pytest.fixture()
def server():
    clock = {"ms": 1_000_000}
    srv = RespServer(FakeRedis(clock=lambda: clock["ms"]))
    host, port = srv.serve_background()
    yield srv, host, port, clock
    srv.shutdown()


class TestProtocol:
    def test_command_frames(self):
        assert encode_command("PING") == b"*1\r\n$4\r\nPING\r\n"
        assert (
            encode_command("XADD", "k", "1-0", "payload", b"\x00\xff")
            == b"*5\r\n$4\r\nXADD\r\n$1\r\nk\r\n$3\r\n1-0\r\n$7\r\npayload\r\n$2\r\n\x00\xff\r\n"
        )

    def test_reply_frames(self):
        class R:
            def __init__(self, data):
                self.data = data

            def read_line(self):
                line, self.data = self.data.split(b"\r\n", 1)
                return line

            def read_exact(self, n):
                out, self.data = self.data[:n], self.data[n + 2 :]
                return out

        assert read_reply(R(b"+OK\r\n")) == "OK"
        assert read_reply(R(b":42\r\n")) == 42
        assert read_reply(R(b"$3\r\nfoo\r\n")) == b"foo"
        assert read_reply(R(b"$-1\r\n")) is None
        assert read_reply(R(b"*2\r\n:1\r\n$1\r\nx\r\n")) == [1, b"x"]
        err = read_reply(R(b"-BUSYGROUP exists\r\n"))
        assert isinstance(err, ResponseError) and "BUSYGROUP" in str(err)


class TestWireCommands:
    def test_binary_payload_roundtrip(self, server):
        _, host, port, _ = server
        c = RespClient(host, port)
        payload = bytes(range(256))
        assert c.xadd("s", {"payload": payload}, id="5-0") == "5-0"
        [(eid, fields)] = c.xrange("s")
        assert eid == "5-0" and fields["payload"] == payload

    def test_duplicate_id_error_text_matches_redis(self, server):
        _, host, port, _ = server
        c = RespClient(host, port)
        c.xadd("s", {"p": b"x"}, id="9-0")
        with pytest.raises(ResponseError, match="equal or smaller"):
            c.xadd("s", {"p": b"y"}, id="9-0")

    def test_pipeline_single_roundtrip_and_error_passthrough(self, server):
        _, host, port, _ = server
        c = RespClient(host, port)
        c.xadd("s", {"p": b"x"}, id="10-0")
        p = c.pipeline()
        p.xadd("s", {"p": b"a"}, id="11-0")
        p.xadd("s", {"p": b"dup"}, id="10-0")  # rejected
        p.xadd("s", {"p": b"b"}, id="12-0")
        results = p.execute(raise_on_error=False)
        assert results[0] == "11-0" and results[2] == "12-0"
        assert isinstance(results[1], ResponseError)
        assert c.xlen("s") == 3

    def test_group_engine_over_the_wire(self, server):
        """The D4-D7 GroupConsumer engine with a WIRE client — identical
        behavior to the in-process run in test_ack.py."""
        from sea_streamer_spark.streaming.ack import AckOptions, AutoCommit, GroupConsumer

        _, host, port, clock = server
        c1_client, c2_client = RespClient(host, port), RespClient(host, port)
        for i in range(6):
            c1_client.xadd("jobs", {"payload": f"p{i}".encode()}, id=f"{100 + i}-0")
        mk = lambda cl, name: GroupConsumer(  # noqa: E731
            cl, "jobs", [0], "g", name,
            AckOptions(mode=AutoCommit.ROLLING, auto_claim_interval_ms=0,
                       auto_claim_idle_ms=60_000),
            clock=lambda: clock["ms"],
        )
        c1, c2 = mk(c1_client, "c1"), mk(c2_client, "c2")
        c1.create_group(from_beginning=True)
        got1 = c1.read(count=3)
        for sid, eid, _ in got1:
            c1.ack(sid, eid)
        c2.read(count=3)  # c2 dies un-acked
        clock["ms"] += 1_000
        assert c1.tick() == 3
        clock["ms"] += 61_000
        claimed = c1.auto_claim(force=True)
        assert [(i, t) for _, i, _, t in claimed] == [
            ("103-0", 2), ("104-0", 2), ("105-0", 2),
        ]
        for sid, eid, _f, _t in claimed:
            c1.ack(sid, eid)
        c1.end()
        assert c1.pending() == []


class TestConnectorOverTcp:
    def test_datasource_reads_via_wire_client(self, spark, server):
        """redis:// path end-to-end: the sea_redis DataSource with
        host/port options — executor Python workers open their own TCP
        connections to the driver-hosted RESP listener (redis-py absent in
        this container ⇒ the RespClient fallback IS the executed path)."""
        from sea_streamer_spark.sources.redis_datasource import SeaRedisDataSource

        srv, host, port, _ = server
        seed = RespClient(host, port)
        for s in range(2):
            key = "wire" if s == 0 else f"wire:{s}"
            for i in range(5):
                seed.xadd(key, {"payload": f"m-{s}-{i}".encode()}, id=f"{200 + i}-{s}")
        spark.dataSource.register(SeaRedisDataSource)
        rows = (
            spark.read.format("sea_redis")
            .option("stream_key", "wire")
            .option("host", host)
            .option("port", str(port))
            .load()
            .collect()
        )
        assert len(rows) == 10
        assert {r.shard_id for r in rows} == {0, 1}
        assert sorted(bytes(r.payload).decode() for r in rows)[0] == "m-0-0"

    def test_executor_side_sink_pipelines_over_tcp(self, spark, server):
        """S5 sink: foreachPartition XADD pipelines from executor processes
        over the socket; replay of the same batch is the idempotent no-op."""
        from sea_streamer_spark.streaming.redis import redis_sink_foreach_batch
        from sea_streamer_spark.uri import StreamUrl

        srv, host, port, _ = server
        url = StreamUrl.parse(f"redis://{host}:{port}/out")
        write = redis_sink_foreach_batch(url=url)
        from sea_streamer_spark.model import envelope_from_events
        from sea_streamer_spark.sources.tables import load_tables

        env = envelope_from_events(
            load_tables(spark, "/root/testdata/sf0.001", "events").events
        ).filter("sequence < 40")
        n = env.count()
        write(env, 0)
        check = RespClient(host, port)
        total = sum(
            check.xlen(k) for k in check.scan_iter(match="*")
        )
        assert total == n
        write(env, 1)  # replayed batch: duplicate explicit ids rejected
        total2 = sum(check.xlen(k) for k in check.scan_iter(match="*"))
        assert total2 == n


class TestWireRegressions:
    def test_pipeline_error_does_not_desync_connection(self, server):
        """A mid-pipeline error must not leave undrained replies: the next
        command on the same connection gets ITS reply, not a stale one."""
        _, host, port, _ = server
        c = RespClient(host, port)
        c.xadd("s", {"p": b"x"}, id="10-0")
        p = c.pipeline()
        p.xadd("s", {"p": b"dup"}, id="10-0")  # -ERR
        p.xadd("s", {"p": b"a"}, id="11-0")
        with pytest.raises(ResponseError):
            p.execute(raise_on_error=True)
        assert c.xlen("s") == 2  # connection still in sync
        assert c.xrange("s")[-1][0] == "11-0"  # later cmds DID apply

    def test_error_with_crlf_payload_keeps_framing(self, server):
        _, host, port, _ = server
        c = RespClient(host, port)
        with pytest.raises(ResponseError):
            c.execute("XTRIM", "k", "MAXLEN", "12\r\n34")
        assert c.ping()  # next reply parses cleanly


class TestCodecRegressions:
    def test_wav_zero_sample_rate_is_none(self):
        import struct

        import numpy as np

        from sea_streamer_spark.operators.audio import encode_wav, parse_wav_header, wav_features

        data = bytearray(encode_wav(np.zeros(10, dtype="<i2")))
        struct.pack_into("<I", data, 24, 0)  # fmt.sample_rate = 0
        assert parse_wav_header(bytes(data)) is None
        assert wav_features(bytes(data)) is None  # no ZeroDivisionError

    def test_mjpeg_split_survives_ff_fill_bytes(self):
        import numpy as np

        from sea_streamer_spark.operators.jpeg import decode_jpeg, encode_jpeg, split_mjpeg

        img = np.full((8, 8, 3), 120, dtype=np.uint8)
        f = encode_jpeg(img, 85)
        # inject spec-legal FF fill bytes before the SOF0 marker
        i = f.find(b"\xff\xc0")
        padded = f[:i] + b"\xff\xff\xff" + f[i:]
        frames = split_mjpeg(padded + f)
        assert len(frames) == 2
        assert decode_jpeg(frames[0]) is not None

    def test_gif_disposal2_restores_global_background(self):
        import numpy as np

        from sea_streamer_spark.operators.gif import decode_gif, encode_gif

        pal = [(60 * c + 10, 60 * c + 20, 60 * c + 30) for c in range(4)]
        f1 = np.full((8, 8), 3, dtype=np.uint8)
        f2 = np.zeros((8, 8), dtype=np.uint8)
        f2[:4] = 1
        data = bytearray(encode_gif([f1, f2], pal))
        first_gce = data.index(b"\x21\xf9\x04")
        data[first_gce + 3] = 0x08  # frame 1 disposal = 2 (restore bg)
        second_gce = data.index(b"\x21\xf9\x04", first_gce + 1)
        data[second_gce + 3] = 0x05  # frame 2 transparent idx 0
        data[second_gce + 6] = 0
        _, _, out = decode_gif(bytes(data))
        # frame 2's transparent half shows the restored BACKGROUND
        # (global palette entry 0), not frame 1's color
        assert (out[1][4:] == np.array(pal, dtype=np.uint8)[0]).all()


class TestWireConcurrency:
    def test_concurrent_clients_consistent(self, server):
        """16 threads × 50 pipelined XADDs against one listener: every add
        lands exactly once and XLEN agrees — the lock gives Redis's
        single-threaded command semantics over concurrent connections."""
        import threading

        _, host, port, _ = server
        n_threads, per = 16, 50
        errs = []

        def worker(t):
            try:
                c = RespClient(host, port)
                p = c.pipeline()
                for i in range(per):
                    p.xadd(f"cc:{t}", {"payload": f"{t}-{i}".encode()}, id=f"{100 + i}-0")
                ids = p.execute()
                assert len(ids) == per
                c.close()
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        check = RespClient(host, port)
        assert sum(check.xlen(f"cc:{t}") for t in range(n_threads)) == n_threads * per


class TestWireBench:
    def test_wire_bench_roundtrip_small(self, spark):
        """The wire-path benchmark harness (bench.py "wire" key) at a tiny
        n: per-shard broker processes spawn, executor tasks produce over
        the production pipeline path and consume via poll_shards, and the
        count reconciles exactly (the harness raises on loss)."""
        from sea_streamer_spark.streaming.wire_bench import benchmark_wire

        out = benchmark_wire(spark, n=2_000, n_shards=2)
        assert out["wire_n"] == 2_000 and out["wire_shards"] == 2
        assert out["wire_produce_100k"] > 0 and out["wire_consume_100k"] > 0
        assert out["wire_relay_100k"] > 0  # reference trio: produce/relay/consume
        assert out["wire_msgs_per_sec"] > 0
