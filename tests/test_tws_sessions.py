"""transformWithStateInPandas sessionization (streaming/tws.py) must be
a drop-in twin of the applyInPandasWithState buffered operator: same
batch-equal output under adversarial out-of-order arrival, same
beyond-delay late-row drop, same NULL-sum semantics. Reuses the
deterministic adversarial fixtures from test_stateful_flush.

The semantics tests run only where the TWS protocol can (protobuf in the
Python workers — see the ENVIRONMENT GATE note in streaming/tws.py);
without it they skip and only the clear-error contract is pinned."""

import pytest

from vector_search_test_spark.streaming.tws import tws_available

needs_tws = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState Python protocol needs protobuf (not in this container)",
)

from tests.test_stateful_flush import (
    EVENTS_SCHEMA,
    GAP,
    _adversarial_ooo_files,
    _batch_sessions,
    _cross_file_inversions,
    _ev,
    _late_drop_files,
    _run_stream,
    _stage,
)
from vector_search_test_spark.streaming.stateful import stream_sessionize


def _tws_stream(spark, inp, delay):
    return stream_sessionize(
        spark,
        str(inp),
        gap_seconds=GAP,
        max_files_per_trigger=1,
        final_flush=True,
        watermark_delay_seconds=delay,
        backend="tws",
    )


@needs_tws
def test_tws_out_of_order_matches_batch(spark, tmp_path):
    files = _adversarial_ooo_files()
    inp = _stage(spark, tmp_path, "tws_ooo", *files)
    assert _cross_file_inversions(inp) > 0

    got, n_batches = _run_stream(
        spark, _tws_stream(spark, inp, 7200), tmp_path, "tws_ooo_q"
    )
    assert n_batches >= 2
    all_rows = [r for f in files for r in f]
    want = _batch_sessions(spark.createDataFrame(all_rows, EVENTS_SCHEMA))
    assert got == want
    assert len(got) == 6 * 3 + 3


@needs_tws
def test_tws_beyond_delay_late_row_is_dropped(spark, tmp_path):
    file0, file1, file2 = _late_drop_files()
    inp = _stage(spark, tmp_path, "tws_late", file0, file1, file2)

    got, n_batches = _run_stream(
        spark, _tws_stream(spark, inp, 600), tmp_path, "tws_late_q"
    )
    assert n_batches >= 3
    want = _batch_sessions(spark.createDataFrame(file0 + file1, EVENTS_SCHEMA))
    assert got == want  # late row contributed nothing
    assert len(got) == len(set(got))


@needs_tws
def test_tws_all_null_session_sums_to_null(spark, tmp_path):
    file0 = [
        _ev(71, 1000, 7, None),
        _ev(72, 1500, 7, None),
        _ev(81, 1000, 8, None),
        _ev(82, 1500, 8, 3.5),
    ]
    inp = _stage(spark, tmp_path, "tws_nulls", file0)

    got, _ = _run_stream(
        spark, _tws_stream(spark, inp, 600), tmp_path, "tws_nulls_q"
    )
    want = _batch_sessions(spark.createDataFrame(file0, EVENTS_SCHEMA))
    assert got == want
    sums = {uid: sv for uid, _, _, _, sv in got}
    assert sums[7] is None
    assert sums[8] == 3.5


def test_tws_requires_delay(spark, tmp_path):
    file0 = [_ev(1, 1000, 1, 1.0)]
    inp = _stage(spark, tmp_path, "tws_nodelay", file0)
    with pytest.raises(ValueError, match="watermark_delay_seconds"):
        stream_sessionize(spark, str(inp), backend="tws", final_flush=True)


def test_tws_unavailable_raises_clearly(spark, tmp_path):
    """Where protobuf is absent the operator must fail fast with an
    actionable message, not crash the stream mid-batch."""
    if tws_available():
        pytest.skip("protobuf present: the operator runs for real here")
    file0 = [_ev(1, 1000, 1, 1.0)]
    inp = _stage(spark, tmp_path, "tws_unavail", file0)
    with pytest.raises(NotImplementedError, match="protobuf"):
        stream_sessionize(
            spark,
            str(inp),
            backend="tws",
            final_flush=True,
            watermark_delay_seconds=600,
        )
