"""salted_repartition strategy="hash": one all-to-all, no global sort."""

import pyarrow as pa
import pytest
import ray.data

from webextract import corpus


def _block_sets(ds):
    """url -> frozenset of co-resident urls (partition membership map)."""
    blocks = [list(b["url"]) for b in
              ds.iter_batches(batch_size=None, batch_format="pandas")]
    out = {}
    for blk in blocks:
        fs = frozenset(blk)
        for u in blk:
            out[u] = fs
    return out


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    tbl = pa.table({"url": [corpus.url_of(i) for i in range(1000)]})
    return ray.data.from_arrow(tbl)


def test_hash_strategy_partitions_without_sort(pages_ds):
    from webextract.pipelines.registry import get_op

    op = get_op("salted_repartition")

    def run():
        return _block_sets(op(
            pages_ds, key="url", key_extract=r"https://([^/]+)/",
            subkey="url", num_blocks=16, salt_buckets=8, strategy="hash",
        ))

    m1 = run()
    m2 = run()
    assert len(m1) == 1000
    # partition MEMBERSHIP is deterministic across runs (contract: contents
    # are a pure function of row bytes; only intra-block order may differ)
    assert m1 == m2
    # the hot host still spreads across >= salt_buckets partitions
    host0 = {u for u in m1 if u.startswith("https://host0.")}
    assert len({m1[u] for u in host0}) >= 8


def test_unknown_strategy_raises(pages_ds):
    from webextract.pipelines.registry import get_op

    with pytest.raises(ValueError, match="strategy"):
        get_op("salted_repartition")(pages_ds, key="url", strategy="zip")


def test_hash_strategy_restores_context(pages_ds):
    from ray.data.context import DataContext, ShuffleStrategy

    from webextract.pipelines.registry import get_op

    before = DataContext.get_current().shuffle_strategy
    get_op("salted_repartition")(pages_ds, key="url", strategy="hash",
                                 num_blocks=4)
    assert DataContext.get_current().shuffle_strategy == before
    assert before != ShuffleStrategy.HASH_SHUFFLE
