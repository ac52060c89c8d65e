"""Stateful streaming operator tests: cross-batch dedup and running
totals via applyInPandasWithState (state survives across micro-batches;
replays are suppressed / accumulated exactly)."""

from __future__ import annotations

import json
import os

import pytest

from aws_kinesis_data_ingestion_restapi_spark.sources import envelope_records
from aws_kinesis_data_ingestion_restapi_spark.sources.events import (
    read_envelope_stream,
    split_corrupt,
)
from aws_kinesis_data_ingestion_restapi_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_totals,
)


def _write_ndjson(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _drain(stream_df, tmp_path, name, mode="update"):
    out = []
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return out


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "input"
    d.mkdir()
    return str(d)


def test_streaming_dedup_suppresses_cross_batch_replays(spark, tmp_path, input_dir):
    recs = envelope_records(12, seed=11)
    # batch 0: first 8; batch 1: REPLAY of 4 of them + 4 new
    _write_ndjson(os.path.join(input_dir, "b0.json"), recs[:8])
    _write_ndjson(os.path.join(input_dir, "b1.json"), recs[4:])
    stream = read_envelope_stream(spark, input_dir, max_files_per_trigger=1)
    good = split_corrupt(stream)[0]
    out = _drain(streaming_dedup(good), tmp_path, "dedup", mode="append")

    keys = [(r["customer_id"], r["order_id"]) for r in out]
    assert len(keys) == len(set(keys)), "a key was emitted twice"
    want = {
        (json.loads(__import__("base64").b64decode(r["Data"]))["customer_id"],
         json.loads(__import__("base64").b64decode(r["Data"]))["order_id"])
        for r in recs
    }
    assert set(keys) == want, "every distinct key emitted exactly once"


def test_streaming_dedup_replay_after_restart(spark, tmp_path, input_dir):
    """State survives a query restart on the same checkpoint: a replay
    in a LATER run is still suppressed."""
    recs = envelope_records(6, seed=12)
    _write_ndjson(os.path.join(input_dir, "b0.json"), recs)

    def run(name="restart"):
        stream = read_envelope_stream(spark, input_dir, max_files_per_trigger=1)
        return _drain(streaming_dedup(split_corrupt(stream)[0]), tmp_path, name, mode="append")

    first = run()
    assert len(first) == 6
    # same records re-delivered in a new file, same checkpoint
    _write_ndjson(os.path.join(input_dir, "b1.json"), recs)
    second = run()
    assert second == [], "replayed keys must stay suppressed after restart"


def test_streaming_running_totals_accumulate(spark, tmp_path, input_dir):
    recs = envelope_records(20, seed=13)
    _write_ndjson(os.path.join(input_dir, "b0.json"), recs[:10])
    _write_ndjson(os.path.join(input_dir, "b1.json"), recs[10:])
    stream = read_envelope_stream(spark, input_dir, max_files_per_trigger=1)
    good = split_corrupt(stream)[0]
    out = _drain(streaming_running_totals(good), tmp_path, "totals")

    # last emission per customer = final running total
    final = {}
    for r in out:
        final[r["customer_id"]] = (r["n_orders"], r["total_amount"])

    import base64

    events = [json.loads(base64.b64decode(r["Data"])) for r in recs]
    want: dict[str, tuple[int, float]] = {}
    for ev in events:
        n, cents = want.get(ev["customer_id"], (0, 0))
        want[ev["customer_id"]] = (
            n + 1,
            cents + int(round(ev["purchaise_details"]["amount"] * 100)),
        )
    assert final == {
        c: (n, cents / 100.0) for c, (n, cents) in want.items()
    }

