"""Federated-learning optimizer tests.

Golden replay mirrors FederatedLearningRPropOptimizerTest.scala:14-56
(30 CSV iterations, +/-1 integer tolerance) using the reference's own
test data read from /root/reference (skipped when absent).  Aggregate
and sink tests mirror FederatedLearningSearchOptimizerTest.scala and
FederatedLearningSearchOptimizerS3SinkTest.scala semantics.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from telemetry_streaming_spark.jobs import federated_optimizer as fed
from tests import fixtures

FRECENCY_DATA = (
    "/root/reference/src/test/resources/com/mozilla/telemetry/learning/"
    "federated/frecency-test-data"
)


@pytest.mark.skipif(not os.path.isdir(FRECENCY_DATA), reason="reference test data absent")
def test_rprop_golden_replay():
    with open(os.path.join(FRECENCY_DATA, "weights.csv")) as fh:
        weights = [[int(x) for x in line.split()] for line in fh.read().splitlines() if line]
    prev_w = np.array(weights[0], dtype=float)
    prev_lr = np.full(len(weights), fed.STARTING_LEARNING_RATE, dtype=float)[: len(prev_w)]
    prev_lr = np.full(len(prev_w), fed.STARTING_LEARNING_RATE, dtype=float)
    prev_g = None
    for it in range(30):
        with open(os.path.join(FRECENCY_DATA, f"updates-{it:02d}.csv")) as fh:
            rows = [
                [float(x) for x in line.split()] for line in fh.read().splitlines() if line
            ]
        gradient = np.sum(np.array(rows), axis=0)  # element-wise sum, as the test does
        new_w, new_lr = fed.rprop_fit(prev_w, gradient, prev_g, prev_lr, align_time_buckets=False)
        expected = weights[it + 1]
        calculated = [int(w) for w in new_w]  # Scala .toInt truncation
        assert all(abs(e - c) <= 1 for e, c in zip(expected, calculated)), (
            f"iteration {it}: expected {expected}, got {calculated}"
        )
        prev_w, prev_lr, prev_g = new_w, new_lr, gradient


def test_rprop_constraints():
    w = np.zeros(22)
    g = np.array([-1.0] * 22)
    new_w, _ = fed.rprop_fit(w, g, None, np.full(22, 2.0), align_time_buckets=True)
    # all weights pushed to -2, shifted non-negative -> 0, then buckets 1..3 staircase
    assert new_w[0] == 0.0 and new_w[1] == 1.0 and new_w[2] == 2.0 and new_w[3] == 3.0


def _updates_df(spark, pings, clock_iso="2016-04-07T13:35:16"):
    return fed.frecency_updates(
        fixtures.to_df(spark, pings),
        model_branch="model1",
        clock=F.lit(clock_iso).cast("timestamp"),
    )


def test_filter_and_aggregate(spark):
    pings = [
        fixtures.frecency_update_ping(),
        fixtures.frecency_update_ping(loss=100.0, meta={"clientId": "client2"}),
        fixtures.frecency_update_ping(study_variation="other-branch"),  # wrong branch
        fixtures.frecency_update_ping(study_variation="model1-not-submitting"),
        fixtures.frecency_update_ping(
            payload={"bookmark_and_history_num_suggestions_displayed": -1}
        ),
        fixtures.main_ping(),  # wrong doctype
    ]
    updates = _updates_df(spark, pings)
    assert updates.count() == 2

    agg = fed.aggregate_updates(updates, window_offset_min=28).collect()
    assert len(agg) == 1
    row = agg[0]
    assert row["modelVersion"] == 140
    assert row["count"] == 2
    assert row["avgLoss"] == pytest.approx((291989.21 + 100.0) / 2)
    assert row["approxClientCount"] == 2
    expected_updates = fixtures.DEFAULT_FRECENCY_UPDATE
    assert row["avgUpdates"] == pytest.approx(expected_updates)
    # 30-min window with 28-min offset: 13:28 <= 13:35 < 13:58
    assert row["window"]["start"].minute == 28


def test_sink_state_machine(spark, tmp_path):
    model_dir, state_dir = str(tmp_path / "model"), str(tmp_path / "state")
    sink = fed.FederatedOptimizerSink(model_dir, state_dir)
    assert sink.state.iteration == 0
    assert sink.state.weights == [float(w) for w in fed.STARTING_WEIGHTS]

    updates = _updates_df(spark, [fixtures.frecency_update_ping()])
    agg = fed.aggregate_updates(updates)
    sink.add_batch(agg)

    assert sink.state.iteration == 1
    assert sink.state.gradient == pytest.approx(fixtures.DEFAULT_FRECENCY_UPDATE)
    with open(os.path.join(model_dir, "latest.json")) as fh:
        model = json.load(fh)
    assert model["iteration"] == 1
    assert len(model["weights"]) == 22
    # first step: lr=2 everywhere, update = 2*sign(g); w[15]=0 with
    # g[15]<0 dips to -2, so the whole vector shifts +2 non-negative
    expected_w0 = fed.STARTING_WEIGHTS[0] + 2 + 2
    assert model["weights"][0] == expected_w0
    assert min(model["weights"]) == 0
    assert os.path.exists(os.path.join(model_dir, "1.json"))
    assert os.path.exists(os.path.join(state_dir, "STATE-1"))

    # restart: a fresh sink restores from the STATE file
    sink2 = fed.FederatedOptimizerSink(model_dir, state_dir)
    assert sink2.state.iteration == 1
    assert sink2.state.weights == sink.state.weights

    # stale model version (< iteration) is ignored
    stale = fed.aggregate_updates(
        _updates_df(spark, [fixtures.frecency_update_ping(model_version=0)])
    )
    sink2.add_batch(stale)
    assert sink2.state.iteration == 1


def test_sink_bootstrap(tmp_path):
    boot = tmp_path / "bootstrap.json"
    st = fed.OptimizerState(iteration=7, weights=[1.0] * 22, learning_rates=[2.0] * 22)
    boot.write_text(st.to_json())
    sink = fed.FederatedOptimizerSink(
        str(tmp_path / "m"), str(tmp_path / "s"), state_bootstrap_file=str(boot)
    )
    assert sink.state.iteration == 7
    assert sink.state.gradient is None


def test_state_json_roundtrip():
    st = fed.OptimizerState(3, [1.5] * 22, [2.0] * 22, [0.1] * 22)
    assert fed.OptimizerState.from_json(st.to_json()) == st


# --- K8 S3 object semantics (S3ClientWrapper parity) ---------------------


def test_s3_model_write_object_semantics(tmp_path):
    """s3:// model output reproduces the reference's putString
    (FederatedLearningSearchOptimizerS3Sink.scala:147-167): latest.json
    + {iteration}.json, public-read canned ACL, JSON content type,
    no-cache headers."""
    moto = pytest.importorskip("moto")
    import json as _json

    import boto3

    from telemetry_streaming_spark.jobs.federated_optimizer import FederatedOptimizerSink

    with moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(Bucket="models")
        sink = FederatedOptimizerSink(
            "s3://models/search/model", str(tmp_path / "state")
        )
        sink._write_model({"weights": [1, 2, 3], "iteration": 7})

        s3 = boto3.client("s3", region_name="us-east-1")
        for key in ("search/model/latest.json", "search/model/7.json"):
            obj = s3.get_object(Bucket="models", Key=key)
            assert _json.loads(obj["Body"].read()) == {"weights": [1, 2, 3], "iteration": 7}
            assert obj["ContentType"] == "application/json"
            assert obj["CacheControl"] == "no-cache, no-store, must-revalidate"
            acl = s3.get_object_acl(Bucket="models", Key=key)
            public_read = [
                g for g in acl["Grants"]
                if g["Grantee"].get("URI", "").endswith("/global/AllUsers")
                and g["Permission"] == "READ"
            ]
            assert public_read, acl["Grants"]


def test_s3_url_parsing():
    from telemetry_streaming_spark.jobs.federated_optimizer import _parse_s3_url

    assert _parse_s3_url("/tmp/models") is None
    assert _parse_s3_url("s3://b/k/p") == ("b", "k/p")
    assert _parse_s3_url("s3://b") == ("b", "")
    with pytest.raises(ValueError):
        _parse_s3_url("s3:///nope")
