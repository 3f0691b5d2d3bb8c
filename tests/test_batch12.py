"""Library-level pins for the round-3 batch-12 additions: lead/ffill
windows, arg-min first_by, bivariate corr, Bloom semi join, triangle
count, order-invariant table checksum, percent_rank/cume_dist."""

import numpy as np
import pyarrow as pa
import ray.data


def _tbl(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


# ---------------------------------------------------------------- key_lead


def test_key_lead_mirrors_lag(ray_session):
    from webextract.functions.temporal import key_lag, key_lead

    t = _tbl(k=[1, 1, 1, 2, 2, 3],
             ts=[10, 5, 7, 1, 2, 9],
             p=[100, 101, 102, 200, 201, 300])
    ds = ray.data.from_arrow(t).repartition(3)
    lead = key_lead(ds, by="k", ts="ts", payload="p").to_pandas()
    lag = key_lag(ds, by="k", ts="ts", payload="p").to_pandas()
    # lead rows are the lag rows re-anchored on the predecessor
    lead = lead.sort_values(["k", "ts"], ignore_index=True)
    lag = lag.sort_values(["k", "ts"], ignore_index=True)
    assert lead.next_p.tolist() == lag.p.tolist()
    assert lead.p.tolist() == lag.prev_p.tolist()
    assert lead.gap.tolist() == lag.gap.tolist()
    # singleton key 3 contributes nothing
    assert 3 not in set(lead.k)


# ---------------------------------------------------------------- first_by


def test_first_by_layout_invariant(ray_session):
    from webextract.functions.agg import first_by

    rng = np.arange(40)
    t = _tbl(k=(rng % 4).tolist(),
             ts=((rng * 7) % 11).tolist(),
             p=rng.tolist())
    expect = {}
    for k, ts, p in zip(t.column("k").to_pylist(),
                        t.column("ts").to_pylist(),
                        t.column("p").to_pylist()):
        cur = expect.get(k)
        if cur is None or (ts, p) < cur:
            expect[k] = (ts, p)
    for nparts in (1, 5, 13):
        ds = ray.data.from_arrow(t).repartition(nparts)
        got = first_by(ds, by="k", order=["ts", "p"]).to_pandas()
        got = got.sort_values("k", ignore_index=True)
        assert {r.k: (r.ts, r.p) for r in got.itertuples()} == expect


# ----------------------------------------------------------------- corr_by


def test_corr_by_perfect_and_inverse(ray_session):
    from webextract.functions.agg import corr_by

    x = list(range(1, 21))
    t = _tbl(g=["a"] * 20 + ["b"] * 20 + ["c"] * 2,
             x=x + x + [5, 5],
             y=[3 * v + 1 for v in x] + [-2 * v for v in x] + [1, 9])
    ds = ray.data.from_arrow(t).repartition(4)
    got = corr_by(ds, by="g", x="x", y="y").to_pandas()
    got = got.set_index("g")
    assert got.loc["a", "corr"] == 1.0
    assert got.loc["b", "corr"] == -1.0
    # zero variance in x -> null corr, covar still defined
    assert np.isnan(got.loc["c", "corr"])
    assert got.loc["c", "covar_samp"] == 0.0


# ---------------------------------------------------------------- checksum


def test_table_checksum_invariance_and_sensitivity(ray_session):
    from webextract.functions.checksum import table_checksum

    t = _tbl(id=[1, 2, 3, 4], s=["a", "b", "c", "d"])
    base = table_checksum(ray.data.from_arrow(t), ["id", "s"]).to_pandas()
    # row order / partitioning invariant
    perm = t.take(pa.array([3, 1, 0, 2]))
    for nparts in (1, 3):
        again = table_checksum(
            ray.data.from_arrow(perm).repartition(nparts),
            ["id", "s"]).to_pandas()
        assert again.checksum[0] == base.checksum[0]
        assert again.n_rows[0] == 4
    # any single-value change moves the checksum
    mut = _tbl(id=[1, 2, 3, 4], s=["a", "b", "X", "d"])
    changed = table_checksum(ray.data.from_arrow(mut), ["id", "s"]).to_pandas()
    assert changed.checksum[0] != base.checksum[0]


def test_table_checksum_matches_duckdb_md5_convention():
    import hashlib
    import struct

    import duckdb

    val = duckdb.connect().execute(
        "SELECT md5_number_lower('x|y')").fetchone()[0]
    d = hashlib.md5(b"x|y").digest()
    assert struct.unpack("<Q", d[8:])[0] == val


# -------------------------------------------------------------- bloom join


def test_bloom_bits_no_false_negatives(ray_session):
    from webextract.functions.joins import _splitmix64, bloom_bits

    keys = list(range(0, 3000, 3))
    ds = ray.data.from_arrow(_tbl(k=keys)).repartition(4)
    bits, mask, n = bloom_bits(ds, on="k", m_bits=1 << 14, n_hashes=4)

    def member(x):
        h = np.uint64(x)
        with np.errstate(over="ignore"):
            for i in range(n):
                hh = _splitmix64(np.array(
                    [h * np.uint64(0x9E3779B97F4A7C15) + np.uint64(i)],
                    dtype=np.uint64))[0] & mask
                if not (bits[int(hh) >> 6] >> (hh & np.uint64(63))) & np.uint64(1):
                    return False
        return True

    assert all(member(k) for k in keys)  # Bloom guarantee
    misses = [x for x in range(1, 3000, 3) if not member(x)]
    assert len(misses) > 800  # fp rate far below 20% at 16 bits/key


def test_bloom_semi_join_exact(ray_session):
    from webextract.functions.joins import bloom_semi_join

    left = ray.data.from_arrow(
        _tbl(k=list(range(100)), payload=list(range(1000, 1100)))
    ).repartition(5)
    right = ray.data.from_arrow(_tbl(k=[2, 3, 5, 7, 11, 97])).repartition(2)
    got = bloom_semi_join(
        left, right, on="k",
        left_schema=pa.schema([("k", pa.int64()), ("payload", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64())])).to_pandas()
    assert sorted(got.k) == [2, 3, 5, 7, 11, 97]
    assert sorted(got.payload) == [1002, 1003, 1005, 1007, 1011, 1097]


# ---------------------------------------------------------------- triangles


def test_triangle_count_known_graphs(ray_session):
    from webextract.functions.graph import triangle_count

    # K4 = 4 triangles; edges given directed/duplicated/self-looped
    k4 = _tbl(src=[0, 0, 0, 1, 1, 2, 2, 0, 3],
              dst=[1, 2, 3, 2, 3, 3, 1, 0, 3])
    got = triangle_count(ray.data.from_arrow(k4).repartition(3)).to_pandas()
    assert got.n_triangles.tolist() == [4]
    # triangle-free path graph still emits exactly one row (0)
    path = _tbl(src=[0, 1, 2], dst=[1, 2, 3])
    got0 = triangle_count(ray.data.from_arrow(path)).to_pandas()
    assert got0.n_triangles.tolist() == [0]


def test_triangle_count_transport_parity(ray_session):
    """The measured one-task broadcast path (default for dimension-sized
    oriented sets) and the forced two-join exchange path
    (broadcast_max=0) must count identically on a random multigraph,
    and the chunked cross product must agree across chunk boundaries
    (5k edges over 200 nodes spans many apex groups)."""
    import numpy as np

    from webextract.functions.graph import triangle_count

    rng = np.random.default_rng(7)
    t = _tbl(src=rng.integers(0, 200, 5000).tolist(),
             dst=rng.integers(0, 200, 5000).tolist())
    ds = ray.data.from_arrow(t).repartition(4)
    fast = triangle_count(ds).to_pandas().n_triangles[0]
    dist = triangle_count(ds, broadcast_max=0).to_pandas().n_triangles[0]
    assert fast == dist > 0
    # apex-degree guard raises on the local path too (star hub)
    star = _tbl(src=[0] * 50, dst=list(range(1, 51)))
    import pytest as _pytest
    with _pytest.raises(Exception, match="max_group"):
        triangle_count(ray.data.from_arrow(star),
                       max_group=10).to_pandas()


# ------------------------------------------------------------------- ffill


def test_key_ffill_hand_case(ray_session):
    from webextract.functions.temporal import key_ffill

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 1, 2], type=pa.int64()),
        "o": pa.array([0, 0, 0, 0, 0, 0], type=pa.int64()),
        "v": pa.array([None, 5.0, None, 7.0, None, None],
                      type=pa.float64()),
    })
    got = key_ffill(ray.data.from_arrow(t).repartition(2),
                    by="k", ts="ts", order2="o", val="v").to_pandas()
    got = got.sort_values(["k", "ts"], ignore_index=True)
    # key 1: first row dropped (no prior non-null), then 5, 5, 7
    assert got.k.tolist() == [1, 1, 1]
    assert got.filled.tolist() == [5.0, 5.0, 7.0]


# ---------------------------------------------------------- percent_rank


def test_rank_agg_pct_single_row_partition(ray_session):
    from webextract.functions.window import rank_agg

    t = _tbl(g=["a", "a", "a", "b"], v=[10, 10, 20, 5],
             tb=[1, 2, 3, 4])
    got = rank_agg(ray.data.from_arrow(t), by="g", val="v", tiebreak="tb",
                   n_tiles=2, pct=True).to_pandas()
    got = got.sort_values(["g", "tb"], ignore_index=True)
    assert got.prnk.tolist() == [0.0, 0.0, 1.0, 0.0]  # single-row b -> 0.0
    assert got.cume.tolist() == [2 / 3, 2 / 3, 1.0, 1.0]


# -------------------------------------------------------- composite join


def test_hash_join_on_no_cross_key_pollution(ray_session):
    from webextract.functions.joins import hash_join_on

    # ("a", 12) must NOT match ("a1", 2) — the packed key is separated
    lds = ray.data.from_arrow(pa.table({
        "k1": pa.array(["a", "a1", "b"]), "k2": pa.array([12, 2, 3]),
        "lv": pa.array([1, 2, 3])})).repartition(2)
    rds = ray.data.from_arrow(pa.table({
        "k1": pa.array(["a1", "b", "a"]), "k2": pa.array([2, 3, 99]),
        "rv": pa.array([10, 20, 30])})).repartition(2)
    got = hash_join_on(
        lds, rds, on=["k1", "k2"],
        left_schema=pa.schema([("k1", pa.string()), ("k2", pa.int64()),
                               ("lv", pa.int64())]),
        right_schema=pa.schema([("k1", pa.string()), ("k2", pa.int64()),
                                ("rv", pa.int64())])).to_pandas()
    got = got.sort_values(["k1", "k2"], ignore_index=True)
    assert list(zip(got.k1, got.k2, got.lv, got.rv)) == [
        ("a1", 2, 2, 10), ("b", 3, 3, 20)]


def test_hash_join_on_semi_anti(ray_session):
    from webextract.functions.joins import hash_join_on

    lds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, 2]), "b": pa.array([1, 2, 1, 2]),
        "v": pa.array([10, 20, 30, 40])}))
    rds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2]), "b": pa.array([2, 1])}))
    ls = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("v", pa.int64())])
    rs = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    semi = hash_join_on(lds, rds, on=["a", "b"], how="semi",
                        left_schema=ls, right_schema=rs).to_pandas()
    anti = hash_join_on(lds, rds, on=["a", "b"], how="anti",
                        left_schema=ls, right_schema=rs).to_pandas()
    assert sorted(semi.v) == [20, 30]
    assert sorted(anti.v) == [10, 40]


# ------------------------------------------------------- per-group HLL


def test_approx_distinct_by_error_bound(ray_session):
    from webextract.functions.sketches import approx_distinct_by

    # groups with known cardinalities 100 / 1000 / 7
    keys, vals = [], []
    for g, n in (("a", 100), ("b", 1000), ("c", 7)):
        for i in range(n):
            keys.append(g)
            vals.append(f"{g}-{i}")
        # duplicates must not inflate the estimate
        for i in range(min(n, 50)):
            keys.append(g)
            vals.append(f"{g}-{i}")
    t = pa.table({"g": pa.array(keys), "v": pa.array(vals)})
    got = approx_distinct_by(
        ray.data.from_arrow(t).repartition(6), by="g", of="v",
        p=10).to_pandas().set_index("g")
    for g, n in (("a", 100), ("b", 1000), ("c", 7)):
        assert abs(got.loc[g, "n_distinct_approx"] - n) / n < 0.15


# -------------------------------------------------------- exact ssjoin


def test_ssjoin_exact_vs_bruteforce(ray_session):
    from webextract.functions.ssjoin import _shingles, ssjoin_pairs

    # 20 docs from a tiny vocab: pairs (2i, 2i+1) are planted near-dups
    # (one word changed), the rest unrelated
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(10):
        words = [base[(j * (i + 3) + i) % len(base)] for j in range(30)]
        texts.append(" ".join(words))
        mut = list(words)
        mut[7] = "CHANGED"
        texts.append(" ".join(mut))
    t = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                  "text": pa.array(texts)})

    # brute-force truth at threshold 0.7
    def jac(a, b):
        sa, sb = set(_shingles(a, 3)), set(_shingles(b, 3))
        inter = len(sa & sb)
        return inter, len(sa) + len(sb) - inter

    expect = set()
    for a in range(20):
        for b in range(a + 1, 20):
            i, u = jac(texts[a], texts[b])
            if u and i * 10 >= 7 * u:
                expect.add((a, b))
    assert expect  # the planted pairs are above threshold

    got = ssjoin_pairs(ray.data.from_arrow(t).repartition(4),
                       threshold=0.7).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == expect
    for r in got.itertuples():
        i, u = jac(texts[r.id_a], texts[r.id_b])
        assert r.jac == i / u


def test_ssjoin_prefix_length_is_exact_integer():
    from fractions import Fraction

    from webextract.functions.ssjoin import _ceil_mul

    # float ceil(0.8*35) would be 29; the exact value is 28
    assert _ceil_mul(Fraction(4, 5), 35) == 28
    assert _ceil_mul(Fraction(4, 5), 36) == 29
    assert _ceil_mul(Fraction(9, 10), 10) == 9


# ------------------------------------------------------------ rolling


def test_key_rolling_hand_case(ray_session):
    from webextract.functions.window import key_rolling

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 9], type=pa.int64()),
        "o": pa.array([0, 0, 0, 0, 0], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 7], type=pa.int64()),
    })
    got = key_rolling(ray.data.from_arrow(t).repartition(2),
                      by="k", ts="ts", order2="o", val="v",
                      window=3).to_pandas()
    got = got.sort_values(["k", "ts"], ignore_index=True)
    assert got.roll_sum.tolist() == [10, 30, 60, 90, 7]
    assert got.roll_n.tolist() == [1, 2, 3, 3, 1]
    assert got.roll_avg.tolist() == [10.0, 15.0, 20.0, 30.0, 7.0]


def test_key_rolling_window_ge_group(ray_session):
    from webextract.functions.window import key_rolling

    t = pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([1, 2], type=pa.int64()),
        "o": pa.array([0, 0], type=pa.int64()),
        "v": pa.array([5, 6], type=pa.int64()),
    })
    got = key_rolling(ray.data.from_arrow(t), by="k", ts="ts",
                      order2="o", val="v", window=10).to_pandas()
    got = got.sort_values("ts", ignore_index=True)
    assert got.roll_sum.tolist() == [5, 11]


def test_ssjoin_property_random_corpora(ray_session):
    """Randomized (seeded) completeness check: ssjoin == brute force on
    30 short docs over a tiny vocab, three seeds, two thresholds."""
    import random

    from webextract.functions.ssjoin import _shingles, ssjoin_pairs

    vocab = "aa bb cc dd ee ff gg hh".split()
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        texts = []
        for i in range(30):
            if i % 3 == 2 and texts:
                base = texts[rng.randrange(len(texts))].split()
                j = rng.randrange(len(base))
                base[j] = rng.choice(vocab)  # near-dup of an earlier doc
                texts.append(" ".join(base))
            else:
                texts.append(" ".join(rng.choice(vocab)
                                      for _ in range(12)))
        t = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                      "text": pa.array(texts)})
        for num, den in ((1, 2), (4, 5)):
            expect = set()
            for a in range(30):
                for b in range(a + 1, 30):
                    sa = set(_shingles(texts[a], 3))
                    sb = set(_shingles(texts[b], 3))
                    i = len(sa & sb)
                    u = len(sa) + len(sb) - i
                    if u and i * den >= num * u:
                        expect.add((a, b))
            got = ssjoin_pairs(ray.data.from_arrow(t).repartition(3),
                               threshold=num / den).to_pandas()
            assert set(zip(got.id_a, got.id_b)) == expect, (seed, num, den)


# ------------------------------------------------------ join-size estimate


def test_join_size_estimate_bounds(ray_session):
    from webextract.functions.sketches import join_size_estimate

    # left: key k appears k+1 times for k in 0..19; right: each key once
    lk = [k for k in range(20) for _ in range(k + 1)]
    rk = list(range(20)) + [99, 100]  # extra right keys join nothing
    true = sum(k + 1 for k in range(20))
    left = ray.data.from_arrow(_tbl(k=lk)).repartition(3)
    right = ray.data.from_arrow(_tbl(k=rk)).repartition(2)
    est = join_size_estimate(left, right, left_on="k", right_on="k",
                             w=4096)
    assert est >= true            # CMS dot product never undercounts
    assert est <= true * 1.5 + 50  # and stays near truth at this load


# ----------------------------------------------------- per-group KLL


def test_approx_quantiles_by_error_bound(ray_session):
    import numpy as np

    from webextract.functions.sketches import approx_quantiles_by

    # two groups with different distributions, 4000 values each
    rows_g, rows_v = [], []
    for g, gen in (("a", lambda i: (i * 37) % 1000),
                   ("b", lambda i: ((i * i) % 5000) + 100)):
        for i in range(4000):
            rows_g.append(g)
            rows_v.append(gen(i))
    t = pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v)})
    got = approx_quantiles_by(ray.data.from_arrow(t).repartition(8),
                              by="g", val="v",
                              qs=(0.5, 0.9, 0.99)).to_pandas()
    for g in ("a", "b"):
        vals = np.sort([v for gg, v in zip(rows_g, rows_v) if gg == g])
        for q in (0.5, 0.9, 0.99):
            est = got[(got.g == g) & (got.q == q)].value.iloc[0]
            # rank error <= 2.5% of the group
            rank = np.searchsorted(vals, est, side="right")
            assert abs(rank - q * len(vals)) <= 0.025 * len(vals) + 1, \
                (g, q, est)
