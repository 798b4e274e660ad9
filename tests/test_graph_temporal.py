"""Tests for the round-4 operators: distributed connected components
(functions/graph.py) and the temporal operators (functions/temporal.py).

Verification strategy: small structured graphs with hand-known answers,
adversarial deep/skewed structure (long path, giant star), and randomized
parity against an independent in-test reference (union-find for components,
``pandas.merge_asof`` for the as-of join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _cc(pairs, **kw):
    from cosmogony_ray.functions.graph import connected_components

    t = pa.table(
        {
            "u": pa.array([p[0] for p in pairs], type=pa.int64()),
            "v": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )
    out = connected_components(rd.from_arrow(t), **kw).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["cluster_id"]))


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


class TestConnectedComponents:
    def test_two_components_and_isolated(self, ray_session):
        labels = _cc([(1, 2), (2, 3), (10, 11)])
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_path_converges(self, ray_session):
        """A 400-node path is the adversarial depth case for min-label
        propagation (O(diameter) rounds); large-star/small-star must
        converge in O(log^2 n) rounds — max_rounds=25 would time out a
        naive propagation at diameter 399."""
        pairs = [(i, i + 1) for i in range(399)]
        labels = _cc(pairs, max_rounds=25)
        assert set(labels) == set(range(400))
        assert set(labels.values()) == {0}

    def test_giant_star_and_dups_and_self_loops(self, ray_session):
        pairs = [(5000, i) for i in range(1000)] * 2 + [(99999, 99999), (5000, 5000)]
        labels = _cc(pairs)
        assert labels[5000] == 0
        assert all(labels[i] == 0 for i in range(1000))
        assert 99999 not in labels  # pure self-loop = isolated

    def test_random_parity_with_union_find(self, ray_session):
        rng = np.random.RandomState(42)
        nodes = rng.choice(5000, size=(800, 2)).tolist()
        pairs = [(a, b) for a, b in nodes if a != b]
        assert _cc(pairs) == _union_find(pairs)

    def test_empty(self, ray_session):
        assert _cc([]) == {}

    def test_star_edges_blocking(self, ray_session):
        from cosmogony_ray.functions.graph import equality_star_edges

        t = pa.table(
            {
                "doc_id": pa.array([3, 1, 2, 9, 5], type=pa.int64()),
                "k": ["a", "a", "a", "b", "c"],
            }
        )
        out = equality_star_edges(rd.from_arrow(t), ["k"]).to_pandas()
        got = set(zip(out["u"], out["v"]))
        # group a = {1,2,3} -> stars to 1; singletons b/c emit nothing
        assert got == {(2, 1), (3, 1)}


class TestAsofJoin:
    def _run(self, left_rows, right_rows):
        from cosmogony_ray.functions.temporal import asof_join

        lt = pa.table(
            {
                "id": pa.array([r[0] for r in left_rows], type=pa.int64()),
                "u": pa.array([r[1] for r in left_rows], type=pa.int64()),
                "ts": pa.array(
                    [r[2] for r in left_rows], type=pa.timestamp("us")
                ),
            }
        )
        rt = pa.table(
            {
                "u": pa.array([r[0] for r in right_rows], type=pa.int64()),
                "ts": pa.array(
                    [r[1] for r in right_rows], type=pa.timestamp("us")
                ),
                "val": pa.array([r[2] for r in right_rows], type=pa.int64()),
            }
        )
        out = asof_join(
            rd.from_arrow(lt),
            rd.from_arrow(rt),
            by="u",
            on="ts",
            value_cols=["val"],
        ).to_pandas()
        return dict(
            zip(out["id"], [None if pd.isna(v) else int(v) for v in out["val"]])
        )

    def test_semantics(self, ray_session):
        T = lambda s: np.datetime64(f"2024-01-01T{s}", "us").item()
        left = [
            (1, 100, T("01:00:00")),  # after r@00:30 -> 7
            (2, 100, T("02:00:00")),  # ties right r@02:00 inclusive -> 8
            (3, 100, T("00:10:00")),  # before any right -> None
            (4, 200, T("05:00:00")),  # user with no right rows -> None
        ]
        right = [
            (100, T("00:30:00"), 7),
            (100, T("02:00:00"), 8),
            (300, T("00:00:01"), 99),  # other user's earlier row must not bleed
        ]
        got = self._run(left, right)
        assert got == {1: 7, 2: 8, 3: None, 4: None}

    def test_random_parity_with_pandas_merge_asof(self, ray_session):
        from cosmogony_ray.functions.temporal import asof_join

        rng = np.random.RandomState(7)
        n_l, n_r = 2000, 1500
        base = np.datetime64("2024-01-01", "us")
        lt = pd.DataFrame(
            {
                "id": np.arange(n_l, dtype=np.int64),
                "u": rng.randint(0, 60, n_l).astype(np.int64),
                "ts": base + rng.randint(0, 10**9, n_l).astype("timedelta64[us]"),
            }
        )
        # unique (u, ts) on the right so tie resolution can't differ
        rt = pd.DataFrame(
            {
                "u": rng.randint(0, 60, n_r).astype(np.int64),
                "ts": base + rng.randint(0, 10**9, n_r).astype("timedelta64[us]"),
                "val": rng.randint(0, 10**6, n_r).astype(np.int64),
            }
        ).drop_duplicates(["u", "ts"])

        expected = pd.merge_asof(
            lt.sort_values("ts"),
            rt.sort_values("ts"),
            on="ts",
            by="u",
            direction="backward",
            allow_exact_matches=True,
        ).sort_values("id")

        out = (
            asof_join(
                rd.from_pandas(lt),
                rd.from_pandas(rt),
                by="u",
                on="ts",
                value_cols=["val"],
            )
            .to_pandas()
            .sort_values("id")
        )
        exp = expected["val"].reset_index(drop=True)
        got = out["val"].reset_index(drop=True)
        assert len(exp) == len(got) == n_l
        assert ((exp.isna() & got.isna()) | (exp == got)).all()


class TestTumblingWindow:
    def test_window_floor_and_sums(self, ray_session):
        from cosmogony_ray.functions.temporal import tumbling_window_agg

        T = lambda s: np.datetime64(f"2024-01-01T{s}", "us").item()
        t = pa.table(
            {
                "k": ["a", "a", "a", "b"],
                "ts": pa.array(
                    [T("00:59:59.999999"), T("01:00:00"), T("01:30:00"), T("01:00:00")],
                    type=pa.timestamp("us"),
                ),
                "x": pa.array([1, 10, 100, 7], type=pa.int64()),
            }
        )
        out = (
            tumbling_window_agg(
                rd.from_arrow(t),
                ts_col="ts",
                window_s=3600,
                keys=["k"],
                sums={"sx": "x"},
                counts="n",
            )
            .to_pandas()
            .sort_values(["k", "window_start_s"])
            .reset_index(drop=True)
        )
        day = int(np.datetime64("2024-01-01", "s").astype(np.int64))
        rows = set(
            zip(out["k"], out["window_start_s"].astype(int), out["sx"].astype(int), out["n"].astype(int))
        )
        assert rows == {
            ("a", day, 1, 1),
            ("a", day + 3600, 110, 2),
            ("b", day + 3600, 7, 1),
        }


class TestGroupedTopK:
    def test_rank_semantics(self, ray_session):
        from cosmogony_ray.functions.relops import grouped_top_k

        t = pa.table(
            {
                "g": ["a"] * 5 + ["b"] * 2 + ["c"],
                "x": pa.array([5, 3, 9, 9, 1, 2, 2, 7], type=pa.int64()),
                "id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], type=pa.int64()),
            }
        )
        out = (
            grouped_top_k(
                rd.from_arrow(t),
                ["g"],
                [("x", "descending"), ("id", "ascending")],
                2,
            )
            .to_pandas()
            .sort_values(["g", "x", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        got = list(zip(out["g"], out["x"], out["id"]))
        # a: 9@3, 9@4 (tie by id); b: both rows (k > group); c: single row
        assert got == [("a", 9, 3), ("a", 9, 4), ("b", 2, 6), ("b", 2, 7), ("c", 7, 8)]

    def test_parity_with_pandas_rank(self, ray_session):
        from cosmogony_ray.functions.relops import grouped_top_k

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {
                "g": rng.randint(0, 40, 3000).astype(np.int64),
                "x": rng.randint(0, 50, 3000).astype(np.int64),
                "id": np.arange(3000, dtype=np.int64),
            }
        )
        exp = (
            df.sort_values(["g", "x", "id"], ascending=[True, False, True])
            .groupby("g")
            .head(5)
        )
        out = grouped_top_k(
            rd.from_pandas(df), ["g"], [("x", "descending"), ("id", "ascending")], 5
        ).to_pandas()
        assert sorted(out["id"]) == sorted(exp["id"])

    def test_sliding_window_coverage(self, ray_session):
        from cosmogony_ray.functions.temporal import sliding_window_agg

        T = lambda s: np.datetime64(f"2024-01-01T{s}", "us").item()
        t = pa.table(
            {
                "k": ["a", "a"],
                "ts": pa.array([T("02:00:00"), T("02:59:59")], type=pa.timestamp("us")),
                "x": pa.array([1, 10], type=pa.int64()),
            }
        )
        out = (
            sliding_window_agg(
                rd.from_arrow(t),
                ts_col="ts",
                window_s=7200,
                slide_s=3600,
                keys=["k"],
                sums={"sx": "x"},
                counts="n",
            )
            .to_pandas()
        )
        day = int(np.datetime64("2024-01-01", "s").astype(np.int64))
        rows = set(zip(out["window_start_s"].astype(int), out["sx"].astype(int), out["n"].astype(int)))
        # both events are in hour 02; each covers windows starting 01:00 and 02:00
        assert rows == {(day + 3600, 11, 2), (day + 7200, 11, 2)}

        import pytest as _pytest
        with _pytest.raises(ValueError):
            sliding_window_agg(
                rd.from_arrow(t), ts_col="ts", window_s=5000, slide_s=3600,
                keys=["k"], sums={"sx": "x"},
            )


class TestSemiAntiJoin:
    def test_semi_and_anti(self, ray_session):
        from cosmogony_ray.functions.joins import hash_join

        left = pa.table(
            {"k": pa.array([1, 2, 3, 4], type=pa.int64()), "x": ["a", "b", "c", "d"]}
        )
        right = pa.table(
            {"k": pa.array([2, 2, 4, 9], type=pa.int64()), "y": [1, 2, 3, 4]}
        )
        ls = pa.schema([("k", pa.int64()), ("x", pa.string())])
        rs = pa.schema([("k", pa.int64()), ("y", pa.int64())])
        semi = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", how="semi",
            left_schema=ls, right_schema=rs,
        ).to_pandas()
        anti = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", how="anti",
            left_schema=ls, right_schema=rs,
        ).to_pandas()
        # semi: left columns only, one row per matching left row (no dup blowup)
        assert sorted(semi.columns) == ["k", "x"]
        assert sorted(semi["k"]) == [2, 4]
        assert sorted(anti["k"]) == [1, 3]


class TestIntervalJoin:
    def test_containment_semantics_vs_bruteforce(self, ray_session):
        from cosmogony_ray.functions.temporal import interval_join

        rng = np.random.RandomState(11)
        base = np.datetime64("2024-01-01", "us")
        # non-overlapping intervals per key: sorted starts with gaps
        iv_rows = []
        for u in range(8):
            t0 = 0
            for k in range(12):
                t0 += rng.randint(1, 5) * 10**6
                s = t0
                t0 += rng.randint(1, 5) * 10**6
                iv_rows.append((u, s, t0, u * 100 + k))
        iv = pa.table(
            {
                "u": pa.array([r[0] for r in iv_rows], type=pa.int64()),
                "s": pa.array([base + np.timedelta64(r[1], "us") for r in iv_rows], type=pa.timestamp("us")),
                "e": pa.array([base + np.timedelta64(r[2], "us") for r in iv_rows], type=pa.timestamp("us")),
                "iv_id": pa.array([r[3] for r in iv_rows], type=pa.int64()),
            }
        )
        n_p = 600
        pts = pa.table(
            {
                "pid": pa.array(np.arange(n_p), type=pa.int64()),
                "u": pa.array(rng.randint(0, 8, n_p), type=pa.int64()),
                "ts": pa.array(
                    [base + np.timedelta64(int(x), "us") for x in rng.randint(0, 10**8, n_p)],
                    type=pa.timestamp("us"),
                ),
            }
        )
        out = interval_join(
            rd.from_arrow(pts), rd.from_arrow(iv), by="u", ts="ts",
            start="s", end="e", value_cols=["iv_id"],
        ).to_pandas().set_index("pid")

        ivd = iv.to_pandas()
        ptd = pts.to_pandas()
        for _, p in ptd.iterrows():
            hits = ivd[(ivd.u == p.u) & (ivd.s <= p.ts) & (p.ts <= ivd.e)]
            want = None if hits.empty else int(hits.iloc[0].iv_id)
            got = out.loc[p.pid, "iv_id"]
            got = None if pd.isna(got) else int(got)
            assert got == want, (p.pid, got, want)


def test_clean_text_markup_and_whitespace(ray_session):
    from cosmogony_ray.functions.textops import clean_text

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": [
                "  <p>Hello <b>World</b></p>\n\tmore   TEXT ",
                "no markup",
            ],
        }
    )
    out = clean_text(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[1, "clean_text"] == "hello world more text"
    assert out.loc[2, "clean_text"] == "no markup"


def test_asof_join_string_keys(ray_session):
    """The by-key may be a string column (object-dtype lexsort path)."""
    from cosmogony_ray.functions.temporal import asof_join

    lt = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "u": ["alice", "bob"],
            "ts": pa.array([100, 100], type=pa.int64()),
        }
    )
    rt = pa.table(
        {
            "u": ["alice", "bob", "bob"],
            "ts": pa.array([50, 40, 99], type=pa.int64()),
            "val": pa.array([7, 8, 9], type=pa.int64()),
        }
    )
    out = (
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), by="u", on="ts", value_cols=["val"])
        .to_pandas()
        .set_index("id")
    )
    assert int(out.loc[1, "val"]) == 7
    assert int(out.loc[2, "val"]) == 9


def test_sliding_total_mass_is_k_times_tumbling(ray_session):
    """Invariant: with window = k·slide, every event lands in exactly k
    sliding windows, so total counts/sums are k× the tumbling totals."""
    from cosmogony_ray.functions.temporal import sliding_window_agg, tumbling_window_agg

    rng = np.random.RandomState(5)
    base = np.datetime64("2024-01-01", "us")
    t = pa.table(
        {
            "k": ["a"] * 500,
            "ts": pa.array(
                [base + np.timedelta64(int(x), "us") for x in rng.randint(0, 10**10, 500)],
                type=pa.timestamp("us"),
            ),
            "x": pa.array(rng.randint(0, 100, 500), type=pa.int64()),
        }
    )
    kw = dict(ts_col="ts", keys=["k"], sums={"sx": "x"}, counts="n")
    tum = tumbling_window_agg(rd.from_arrow(t), window_s=900, **kw).to_pandas()
    sli = sliding_window_agg(
        rd.from_arrow(t), window_s=2700, slide_s=900, **kw
    ).to_pandas()
    assert sli["n"].sum() == 3 * tum["n"].sum() == 3 * 500
    assert sli["sx"].sum() == 3 * tum["sx"].sum()


def test_hash_join_right_unique(ray_session):
    """right_unique fast path: equal results to the general kernel, and a
    loud error when the uniqueness claim is violated."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from cosmogony_ray.functions.joins import hash_join

    left = pa.table({"k": pa.array([1, 2, 2, 3], type=pa.int64()), "v": ["a", "b", "c", "d"]})
    right = pa.table({"k": pa.array([2, 3, 9], type=pa.int64()), "w": ["x", "y", "z"]})
    for how in ("left", "inner"):
        slow = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", how=how
        ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        fast = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", how=how, right_unique=True
        ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        assert slow.equals(fast), how
    dup = pa.table({"k": pa.array([2, 2], type=pa.int64()), "w": ["x", "y"]})
    with pytest.raises(Exception, match="duplicate"):
        hash_join(
            rd.from_arrow(left), rd.from_arrow(dup), "k", how="left", right_unique=True
        ).materialize()
