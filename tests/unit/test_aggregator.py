"""Unit tests: call/group/user aggregation."""

from tetraear_tpu.frame.aggregator import CallAggregator


def _frame(tg=None, ssi=None, enc=False, voice=False, ctype="Group"):
    return {
        "call_metadata": {"talkgroup_id": tg, "source_ssi": ssi,
                          "call_type": ctype, "priority": 1},
        "encrypted": enc,
        "has_voice": voice,
    }


def test_call_lifecycle():
    agg = CallAggregator(call_timeout_s=3.0)
    t = 100.0
    agg.add_frame(_frame(tg=500, ssi=9001, voice=True), now=t)
    agg.add_frame(_frame(tg=500, ssi=9001), now=t + 1)
    assert len(agg.active_calls) == 1
    call = agg.active_calls[500]
    assert call.frames == 2 and call.has_voice
    assert call.source_ssi == 9001

    # idle past timeout -> finished
    done = agg.poll(now=t + 10)
    assert len(done) == 1
    assert not agg.active_calls
    assert done[0].duration_s == 1.0


def test_groups_and_users_accumulate():
    agg = CallAggregator()
    t = 50.0
    for i in range(3):
        agg.add_frame(_frame(tg=100, ssi=1), now=t + i)
    agg.add_frame(_frame(tg=200, ssi=1), now=t + 3)
    agg.add_frame(_frame(tg=100, ssi=2), now=t + 4)
    snap = agg.snapshot()
    assert snap["groups"][0]["talkgroup"] == 100
    assert snap["groups"][0]["frames"] == 4
    users = {u["ssi"]: u for u in snap["users"]}
    assert users[1]["frames"] == 4
    assert users[1]["talkgroups"] == [100, 200]


def test_pipeline_exposes_aggregator():
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import SyntheticTetraSource
    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=False)
    pipe = Pipeline(cfg)
    pipe.run(SyntheticTetraSource(sample_rate=2.4e6, snr_db=25, seed=2),
             max_blocks=2)
    snap = pipe.aggregator.snapshot()
    assert snap["groups"], "no talkgroups aggregated"
    assert snap["users"], "no users aggregated"
