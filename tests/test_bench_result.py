"""bench.py's partial-result estimator (_result_from_state) is what the
driver records when the compile-queue wedges mid-run — its honesty rules
(denoise never estimated; missing minor phases charged documented UPPER
bounds so img/s only understates; provenance in the JSON) are contract."""

import bench


def _state(**kw):
    st = dict(
        encode_parts={"vae": 0.26, "towers": 0.09},
        encode_expected=["vae", "towers"],
        encode_all=True,
        denoise=7.05,
        decode=0.19,
        batch=2,
        metric="m",
    )
    st.update(kw)
    return st


def test_complete_state_is_not_partial_and_value_exact():
    result, desc = bench._result_from_state(_state())
    total = 0.26 + 0.09 + 7.05 + 0.19
    assert result["partial"] is False
    assert result["estimated_phases"] == []
    assert result["value"] == round(2 / total, 4)
    assert result["vs_baseline"] == round(
        2 / total / bench.BASELINE_IMG_PER_SEC, 3)
    assert "PARTIAL" not in desc


def test_no_denoise_means_no_number():
    result, desc = bench._result_from_state(_state(denoise=None))
    assert result is None
    assert "no honest partial number" in desc
    # and an empty/fresh state journal behaves the same
    assert bench._result_from_state({})[0] is None


def test_missing_towers_charged_upper_bound_and_flagged():
    st = _state(encode_parts={"vae": 0.26}, encode_all=False)
    result, desc = bench._result_from_state(st)
    assert result["partial"] is True
    assert result["estimated_phases"] == ["encode:towers"]
    total = 0.26 + bench.ENCODE_EST_UB["towers"] + 7.05 + 0.19
    assert result["value"] == round(2 / total, 4)
    assert "PARTIAL" in desc
    # the estimate can only UNDERSTATE throughput vs the measured value
    assert result["value"] < bench._result_from_state(_state())[0]["value"]


def test_missing_decode_charged_upper_bound():
    result, _ = bench._result_from_state(_state(decode=None))
    assert result["partial"] is True
    assert result["estimated_phases"] == ["decode"]
    total = 0.26 + 0.09 + 7.05 + bench.DECODE_EST_UB
    assert result["value"] == round(2 / total, 4)
