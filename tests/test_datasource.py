"""Python DataSource API tests: the caltopo format in batch and
streaming mode against a local fixture HTTP server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_caltopo_spark.caltopo.datasource import register
from etl_caltopo_spark.caltopo.fixtures import fixture_envelope_json
from etl_caltopo_spark.caltopo.pipeline import run_pipeline


@pytest.fixture(scope="module")
def fixture_server():
    """Serves the fixture envelope at /api/v1/map/<id>/since/<n>,
    echoing the requested since value into result.timestamp + 1000 so
    the stream reader has an advancing offset.  Counts requests."""
    state = {"requests": []}
    envelope = json.loads(fixture_envelope_json())

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["requests"].append(self.path)
            parts = self.path.strip("/").split("/")
            since = int(parts[-1])
            body = dict(envelope)
            body["result"] = dict(envelope["result"])
            body["result"]["timestamp"] = max(since, 0) + 1000
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            state.setdefault("posts", []).append(
                json.loads(self.rfile.read(n).decode("utf-8"))
            )
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()


def test_batch_read_one_partition_per_map(spark, fixture_server):
    url, state = fixture_server
    register(spark)
    df = (
        spark.read.format("caltopo")
        .option("shareIds", "MAP-A,MAP-B,MAP-C")
        .option("baseUrl", url)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # fetch parallelism == map count
    rows = {r["share_id"]: r["body_json"] for r in df.collect()}
    assert set(rows) == {"MAP-A", "MAP-B", "MAP-C"}
    assert all(json.loads(b)["status"] == "ok" for b in rows.values())


def test_batch_read_feeds_pipeline(spark, fixture_server):
    url, _ = fixture_server
    register(spark)
    df = (
        spark.read.format("caltopo")
        .option("shareIds", "MAP-A")
        .option("baseUrl", url)
        .load()
    )
    out = run_pipeline(df)
    assert out.count() > 0


def test_stream_read_advances_since_offset(spark, fixture_server, tmp_path):
    url, state = fixture_server
    register(spark)
    state["requests"].clear()
    stream = (
        spark.readStream.format("caltopo")
        .option("shareIds", "MAP-S")
        .option("baseUrl", url)
        .load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() >= 1
    first_requests = [p for p in state["requests"] if "MAP-S" in p]
    assert first_requests and first_requests[0].endswith("/since/-500")

    # second run restarts from the CHECKPOINTED offset, not -500:
    # the server answered since=-500 with timestamp 1000
    stream2 = (
        spark.readStream.format("caltopo")
        .option("shareIds", "MAP-S")
        .option("baseUrl", url)
        .load()
    )
    q2 = (
        stream2.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    later = [p for p in state["requests"] if "MAP-S" in p]
    assert any(p.endswith("/since/1000") for p in later), later


def test_write_format_posts_feature_collections(spark, fixture_server):
    """df.write.format("caltopo") submits one FeatureCollection POST
    per non-empty partition from the EXECUTORS; the union of posted
    features equals the pipeline output exactly once."""
    url, state = fixture_server
    register(spark)
    from etl_caltopo_spark.caltopo.fixtures import fixture_envelope_df

    out = run_pipeline(fixture_envelope_df(spark)).repartition(4)
    expected = sorted(r["id"] for r in out.collect())
    state["posts"] = []
    (
        out.write.format("caltopo")
        .option("url", f"{url}/api/v1/layer/TEST/submit")
        .mode("append")
        .save()
    )
    posts = state["posts"]
    assert len(posts) > 1  # partition-parallel submits, not one driver POST
    posted = [f["id"] for fc in posts for f in fc["features"]]
    assert sorted(posted) == expected
    assert all(fc["type"] == "FeatureCollection" for fc in posts)
