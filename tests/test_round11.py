"""Round-11 tests: the unigram-LM tokenizer family and incremental
IVF assignment.

Structure mirrors test_round10: the adversarial-fixture sweeps give
every oracled query cross-engine coverage automatically; these add
structurally independent serial references (closed forms, brute-force
enumerations) for the algorithmic cores, the EM's
likelihood-monotonicity property, Viterbi bounds, and the plan test
proving the incremental IVF path scans only the batch.
"""

from __future__ import annotations

import math

import pytest


# ----------------------------------------------- lattice DP core


def _brute_segmentations(word: str, max_len: int) -> list[tuple[str, ...]]:
    """Exhaustive segmentation enumeration — the ground truth the DP
    must reproduce. Exponential; only for short words in tests."""
    if not word:
        return [()]
    out = []
    for k in range(1, min(len(word), max_len) + 1):
        for rest in _brute_segmentations(word[k:], max_len):
            out.append((word[:k],) + rest)
    return out


def test_forward_backward_match_brute_force():
    from programmers_data_spark.queries import round11_ops as r11

    one = lambda p: 1  # noqa: E731
    for word in ["a", "ab", "abc", "abcd", "table", "streams"]:
        segs = _brute_segmentations(word, r11.UNI_MAX_PIECE_LEN)
        a = r11._forward(word, r11.UNI_MAX_PIECE_LEN, one)
        b = r11._backward(word, r11.UNI_MAX_PIECE_LEN, one)
        n = len(word)
        assert a[n] == len(segs) == b[0]
        # occupancy identity: alpha[j] * beta[i] counts exactly the
        # segmentations containing a piece spanning [j, i)
        for j in range(n):
            for i in range(j + 1, min(j + r11.UNI_MAX_PIECE_LEN, n) + 1):
                piece = word[j:i]
                n_containing = sum(
                    1
                    for s in segs
                    for (pos, p) in _with_positions(s)
                    if pos == j and p == piece
                )
                assert a[j] * b[i] == n_containing, (word, j, i)


def _with_positions(seg: tuple[str, ...]):
    pos = 0
    for p in seg:
        yield pos, p
        pos += len(p)


def test_forward_matches_generalized_fibonacci():
    """The closed form the oracle uses: full-lattice alpha[i] = T(i)."""
    from programmers_data_spark.queries import round11_ops as r11

    t = r11._tetranacci(r11.UNI_CONTRACT_MAXLEN)
    one = lambda p: 1  # noqa: E731
    word = "x" * r11.UNI_CONTRACT_MAXLEN
    a = r11._forward(word, r11.UNI_MAX_PIECE_LEN, one)
    b = r11._backward(word, r11.UNI_MAX_PIECE_LEN, one)
    assert a == t
    assert b == list(reversed(t))


# ----------------------------------------------- seed + contract


def test_seed_pieces_serial_reference():
    from programmers_data_spark.queries import round11_ops as r11

    wc = [("abab", 10), ("aba", 5), ("zz", 1)]
    seed = dict(r11._seed_pieces(wc, cap=100, max_len=3))
    # 'ab': 2 occurrences in abab (10 each) + 1 in aba (5) = 25
    assert seed["ab"] == 25
    assert seed["ba"] == 15
    assert seed["aba"] == 15  # positions 0 in abab + 0 in aba
    assert seed["bab"] == 10
    assert seed["zz"] == 1
    # cap + tie-break: freq desc then piece asc
    top = r11._seed_pieces(wc, cap=2, max_len=3)
    assert top == [("ab", 25), ("aba", 15)]


def test_em_contract_mass_hand_example():
    """Hand-check the fixed-point occupancy for one tiny word table:
    word 'aa' (count 3): segmentations {a|a, aa} -> T-counts
    alpha=[1,1,2]; piece 'aa' occupies (j=0,i=2) in 1 of 2
    segmentations -> mass = floor(3 * 1*1 * SCALE / 2)."""
    from programmers_data_spark.queries import round11_ops as r11

    one = lambda p: 1  # noqa: E731
    a = r11._forward("aa", r11.UNI_MAX_PIECE_LEN, one)
    b = r11._backward("aa", r11.UNI_MAX_PIECE_LEN, one)
    assert a == [1, 1, 2]
    mass = (3 * a[0] * b[2] * r11.UNI_SCALE) // a[2]
    assert mass == (3 * r11.UNI_SCALE) // 2


# ------------------------------------------------------- EM model


def test_unigram_em_serial_reference(spark, sf_smoke):
    """The trained theta is a probability distribution; every vocab
    piece is a substring of some capped word; all single chars of the
    corpus are present (total segmentability); and the EM posteriors
    re-derive from an independent serial E-step re-implementation."""
    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.queries import round11_ops as r11

    theta = r11.train_unigram_lm(spark, sf_smoke)
    assert abs(sum(theta.values()) - 1.0) < 1e-9
    wc = r11._capped_word_counts(spark, sf_smoke)
    words = [w for w, _ in wc]
    chars = {ch for w in words for ch in w}
    assert chars <= set(theta)
    for p in theta:
        assert any(p in w for w in words), p

    # independent E-step: brute-force enumeration of segmentations
    # (words are <= 8 chars in the fixtures) instead of the DP
    def brute_estep(th):
        e = {p: 0.0 for p in th}
        for w, c in wc:
            segs = [
                s
                for s in _brute_segmentations(w, r11.UNI_MAX_PIECE_LEN)
                if all(p in th for p in s)
            ]
            weights = [math.prod(th[p] for p in s) for s in segs]
            z = sum(weights)
            for s, wt in zip(segs, weights):
                for p in s:
                    e[p] += c * wt / z
        return e

    # run the reference EM from the same init and compare
    char_freq: dict[str, int] = {}
    for w, c in wc:
        for ch in w:
            char_freq[ch] = char_freq.get(ch, 0) + c
    vocab: dict[str, float] = dict(sorted(char_freq.items()))
    for p, f in r11._seed_pieces(wc):
        vocab[p] = float(f)
    total = sum(vocab.values())
    ref = {p: f / total for p, f in vocab.items()}
    for _ in range(r11.UNI_EM_ITERS):
        e = brute_estep(ref)
        z = sum(e.values())
        ref = {p: v / z for p, v in e.items()}
    assert set(ref) == set(theta)
    for p in ref:
        assert theta[p] == pytest.approx(ref[p], rel=1e-9, abs=1e-12), p


def test_unigram_em_likelihood_monotone(spark, sf_smoke):
    """EM's defining property: corpus log-likelihood is nondecreasing
    across iterations (checked over the actual capped word table with
    the production DP)."""
    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.queries import round11_ops as r11

    wc = r11._capped_word_counts(spark, sf_smoke)

    def loglik(th):
        ll = 0.0
        for w, c in wc:
            a = r11._forward(w, r11.UNI_MAX_PIECE_LEN, th.get)
            ll += c * math.log(a[len(w)])
        return ll

    char_freq: dict[str, int] = {}
    for w, c in wc:
        for ch in w:
            char_freq[ch] = char_freq.get(ch, 0) + c
    vocab: dict[str, float] = dict(sorted(char_freq.items()))
    for p, f in r11._seed_pieces(wc):
        vocab[p] = float(f)
    total = sum(vocab.values())
    theta = {p: f / total for p, f in vocab.items()}
    prev = loglik(theta)
    for _ in range(3):
        e = {p: 0.0 for p in theta}
        for w, c in wc:
            n = len(w)
            a = r11._forward(w, r11.UNI_MAX_PIECE_LEN, theta.get)
            b = r11._backward(w, r11.UNI_MAX_PIECE_LEN, theta.get)
            norm = a[n]
            for k in range(1, r11.UNI_MAX_PIECE_LEN + 1):
                for j in range(n - k + 1):
                    th = theta.get(w[j : j + k])
                    if th:
                        e[w[j : j + k]] += c * (a[j] * th * b[j + k]) / norm
        z = sum(e.values())
        theta = {p: v / z for p, v in e.items()}
        cur = loglik(theta)
        assert cur >= prev - 1e-9
        prev = cur


def test_viterbi_encode_bounds(spark, sf_smoke):
    """Every doc's unigram token count is between ceil(chars/L) (all
    max-length pieces) and chars (all single chars), and n_words
    matches the whitespace tokenizer."""
    from programmers_data_spark import registry

    registry.load_all()
    import pyspark.sql.functions as F

    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.functions import textfn
    from programmers_data_spark.queries import round11_ops as r11

    enc = registry.QUERIES["unigram_encoded_counts"](spark, sf_smoke)
    chars = (
        load_table(spark, sf_smoke, "documents")
        .select(
            "doc_id",
            F.aggregate(
                F.transform(textfn.tokenize("text"), F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("n_chars"),
            textfn.token_count("text").alias("n_words_ref"),
        )
    )
    rows = enc.join(chars, "doc_id").collect()
    assert rows
    L = r11.UNI_MAX_PIECE_LEN
    for r in rows:
        assert r.n_words == r.n_words_ref
        assert r.n_tokens <= r.n_chars
        assert r.n_tokens >= -(-r.n_chars // L), r


def test_viterbi_picks_most_probable_segmentation():
    """Serial check of the encoder's Viterbi against brute force on a
    synthetic model (independent of Spark)."""
    import itertools

    model = {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.05, "abab": 0.2}
    lp = {p: math.log(v) for p, v in model.items()}

    def brute_best(word, max_len):
        best = None
        for seg in _brute_segmentations(word, max_len):
            if all(p in lp for p in seg):
                score = sum(lp[p] for p in seg)
                if best is None or score > best[0]:
                    best = (score, len(seg))
        return best

    def viterbi(word, max_len):
        neg_inf = float("-inf")
        best = [(neg_inf, 0)] * (len(word) + 1)
        best[0] = (0.0, 0)
        for i in range(1, len(word) + 1):
            acc, toks = neg_inf, 0
            for k in range(1, min(i, max_len) + 1):
                s = lp.get(word[i - k : i])
                if s is not None and best[i - k][0] != neg_inf:
                    cand = best[i - k][0] + s
                    if cand > acc:
                        acc, toks = cand, best[i - k][1] + 1
            best[i] = (acc, toks)
        return best[len(word)]

    for word in ["".join(p) for p in itertools.product("ab", repeat=6)]:
        bs = brute_best(word, 4)
        vs = viterbi(word, 4)
        if bs is None:
            assert vs[0] == float("-inf")
        else:
            assert vs[0] == pytest.approx(bs[0], rel=1e-12)


# ---------------------------------------------- incremental IVF


def test_ivf_assign_batch_scans_only_the_batch(spark, sf_smoke):
    """The operational incremental path must plan as: one embeddings
    scan with the batch predicate -> Arrow GEMM. No join, no second
    scan, no corpus-sized anything."""
    import pyspark.sql.functions as F

    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.queries.round11_ops import (
        IVF_BATCH_RESIDUE,
        ivf_assign_batch,
    )
    from programmers_data_spark.queries.similarity_ops import (
        ivf_index,
        load_vectors,
    )

    _corpus, bc, _k = ivf_index(spark, sf_smoke)
    batch = load_vectors(spark, sf_smoke).filter(
        F.col("vec_id") % 10 == IVF_BATCH_RESIDUE
    )
    inc = ivf_assign_batch(batch, bc)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert f"% 10) = {IVF_BATCH_RESIDUE}" in plan, plan
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_ivf_incremental_matches_full_assignment(spark, sf_smoke):
    """Value-level incremental ≡ full: the contract's verdict row
    says 0 mismatches; this checks the underlying per-vector
    agreement directly (not just the aggregate)."""
    import pyspark.sql.functions as F

    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.queries.round11_ops import (
        IVF_BATCH_RESIDUE,
        ivf_assign_batch,
    )
    from programmers_data_spark.queries.similarity_ops import (
        ivf_index,
        load_vectors,
    )

    corpus, bc, n_cells = ivf_index(spark, sf_smoke)
    batch = load_vectors(spark, sf_smoke).filter(
        F.col("vec_id") % 10 == IVF_BATCH_RESIDUE
    )
    inc = {r.vec_id: r.cell for r in ivf_assign_batch(batch, bc).collect()}
    full = {
        r.vec_id: r.cell
        for r in corpus.filter(
            F.col("vec_id") % 10 == IVF_BATCH_RESIDUE
        ).collect()
    }
    assert inc == full
    assert inc, "empty batch would make the test vacuous"
    assert all(0 <= c < n_cells for c in inc.values())


# ------------------------------------------ stream_upsert_publish


def test_stream_upsert_publish_matches_keep_latest(spark, sf_smoke):
    """Per-key values in the final store equal the batch-free global
    keep-latest rule (the oracle's claim, re-derived serially)."""
    import pyspark.sql.functions as F

    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.catalog import load_table

    snap = {
        r.user_id: (r.last_event_id, r.last_value, r.last_ts_us)
        for r in registry.QUERIES["stream_upsert_publish"](
            spark, sf_smoke
        ).collect()
    }
    ev = (
        load_table(spark, sf_smoke, "events")
        .select(
            "user_id", "event_id", "value",
            F.unix_micros("ts").alias("t_us"),
        )
        .collect()
    )
    best: dict[int, tuple] = {}
    for r in ev:
        k = (r.t_us, r.event_id)
        if r.user_id not in best or k > best[r.user_id][:2]:
            best[r.user_id] = (r.t_us, r.event_id, r.value)
    assert set(snap) == set(best)
    for uid, (t_us, eid, val) in best.items():
        assert snap[uid] == (eid, val, t_us), uid


def test_stream_upsert_publish_retains_across_batches(spark, tmp_path):
    """The foreachBatch upsert must be a real MERGE, not a last-batch
    overwrite. The driver fixture's users are all active to the end,
    so retention is forced with a synthetic feed: one user goes quiet
    after the first slice, one after the second, one stays active —
    the final store must keep each quiet user's early row through the
    later upserts (slice coverage over the whole grid)."""
    import datetime as dt

    import pandas as pd

    from programmers_data_spark import registry

    registry.load_all()
    from programmers_data_spark.queries import round11_ops as r11

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 90 hourly slots; user 1 events in hours 0-9, user 2 in 30-39,
    # user 3 everywhere — slice cuts fall at hours ~29.67 and ~59.33
    eid = 0
    for h in range(90):
        active = [3]
        if h < 10:
            active.append(1)
        if 30 <= h < 40:
            active.append(2)
        for uid in active:
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + dt.timedelta(hours=h),
                    "user_id": uid,
                    "event_type": "click",
                    "value": float(uid * 1000 + h),
                    "props": "{}",
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "feed"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", index=False)

    snap = {
        r.user_id: (r.last_value, r.last_ts_us)
        for r in registry.QUERIES["stream_upsert_publish"](
            spark, str(d)
        ).collect()
    }
    # user 1's last event (hour 9, slice 0) survived two later upserts
    assert snap[1][0] == 1000.0 + 9
    # user 2's last event (hour 39, slice 1) survived the final upsert
    assert snap[2][0] == 2000.0 + 39
    # user 3 reflects the true latest
    assert snap[3][0] == 3000.0 + 89
    n = r11.UPSERT_PUB_N_SLICES
    utc = dt.timezone.utc  # fixture timestamps are instants; don't
    # let the host TZ shift the cut comparison
    lo = min(r["ts"] for r in rows).replace(tzinfo=utc).timestamp()
    hi = max(r["ts"] for r in rows).replace(tzinfo=utc).timestamp()
    cuts = [lo + k * (hi - lo) / n for k in range(1, n)]
    hours = {
        uid: (ts_us / 1e6 - lo) / 3600 for uid, (_v, ts_us) in snap.items()
    }
    slices = {
        uid: sum(1 for c in cuts if ts_us / 1e6 >= c)
        for uid, (_v, ts_us) in snap.items()
    }
    assert set(slices.values()) == set(range(n)), (slices, hours)


# ------------------- second wave: PIT, z-order, baskets, projection


def test_scd2_point_in_time_serial_reference(spark, sf_smoke):
    """Re-derive every probe's expected match with a plain loop: the
    matched version must be the user's latest version at or before
    the probe timestamp (ties among equal version timestamps resolved
    to the largest event_id — the zero-length-interval rule), and a
    probe with no earlier version matches nothing."""
    import pyspark.sql.functions as F

    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table

    registry.load_all()
    got = {
        r.probe_id: (r.version_id, r.state_type, r.state_value)
        for r in registry.QUERIES["scd2_point_in_time"](
            spark, sf_smoke
        ).collect()
    }
    ev = (
        load_table(spark, sf_smoke, "events")
        .select(
            "event_id", "user_id", "event_type", "value",
            F.unix_micros("ts").alias("t_us"),
        )
        .collect()
    )
    vers: dict[int, list] = {}
    for r in ev:
        if r.event_id % 3 == 0:
            vers.setdefault(r.user_id, []).append(r)
    for vs in vers.values():
        vs.sort(key=lambda r: (r.t_us, r.event_id))
    expected = {}
    for r in ev:
        if r.event_id % 3 != 1:
            continue
        cands = [v for v in vers.get(r.user_id, []) if v.t_us <= r.t_us]
        if cands:
            best = max(cands, key=lambda v: (v.t_us, v.event_id))
            expected[r.event_id] = (best.event_id, best.event_type, best.value)
    assert got == expected


def test_scd2_point_in_time_plans_binned_hash_join(spark, sf_smoke):
    """The range join must compile to a HASH join on (bucket,
    user_id) — the entire point of the binned rewrite. The only
    nested-loop node allowed is the 1-row interval-cap broadcast."""
    from programmers_data_spark import registry

    registry.load_all()
    df = registry.QUERIES["scd2_point_in_time"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row cap
    assert (
        "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    ), plan


def test_zorder_prune_contract_invariants(spark, sf_smoke):
    """Theorem-level rows: pruning is sound per layout (no selected
    row in a skipped file) and layout never changes query results;
    and on the driver fixture the z-layout's 2-D pruning strictly
    dominates the single-axis linear sort for the 2-D predicate."""
    from programmers_data_spark import registry

    registry.load_all()
    rows = {
        r.layout: r
        for r in registry.QUERIES["zorder_prune_contract"](
            spark, sf_smoke
        ).collect()
    }
    assert set(rows) == {"zorder", "linear"}
    assert all(r.prune_sound and r.missed_selected == 0 for r in rows.values())
    assert rows["zorder"].rows_selected == rows["linear"].rows_selected
    assert rows["zorder"].rows_scanned <= rows["linear"].rows_scanned
    for r in rows.values():
        assert r.rows_scanned >= r.rows_selected  # scanned superset


def test_copurchase_pairs_serial_reference(spark, sf_smoke):
    """Brute-force the basket pairs with itertools on the collected
    smoke fixture and compare the full result."""
    from collections import Counter
    from itertools import combinations

    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries import round11_ops as r11

    registry.load_all()
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    support = Counter(p for parts in baskets.values() for p in parts)
    frequent = {p for p, c in support.items() if c >= r11.CP_MIN_PART_ORDERS}
    pairs = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(p for p in parts if p in frequent), 2):
            pairs[(a, b)] += 1
    expected = sorted(
        (
            (a, b, c, support[a], support[b])
            for (a, b), c in pairs.items()
            if c >= r11.CP_MIN_PAIR_ORDERS
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[: r11.CP_TOPK]
    got = [
        (r.part_a, r.part_b, r.pair_orders, r.orders_a, r.orders_b)
        for r in registry.QUERIES["copurchase_pairs"](
            spark, sf_smoke
        ).collect()
    ]
    assert got == expected


def test_rp_projection_serial_reference(spark, sf_smoke):
    """The relational GEMM equals a numpy re-derivation of
    floor-quantized components x the md5 sign matrix, for every
    projected coordinate."""
    import math

    import numpy as np

    from programmers_data_spark import registry
    from programmers_data_spark.queries import round11_ops as r11
    from programmers_data_spark.queries.similarity_ops import load_vectors

    registry.load_all()
    vecs = {
        r.vec_id: r.emb
        for r in load_vectors(spark, sf_smoke).filter("vec_id < 5").collect()
    }
    signs = np.array(
        [
            [r11._rp_sign(j, d) for d in range(64)]
            for j in range(r11.RP_OUT_DIM)
        ],
        dtype=np.int64,
    )
    got = {
        (r.vec_id, r.j): r.y
        for r in registry.QUERIES["rp_project"](spark, sf_smoke)
        .filter("vec_id < 5")
        .collect()
    }
    for vid, emb in vecs.items():
        q = np.array([math.floor(x * r11.RP_SCALE) for x in emb], dtype=np.int64)
        y = signs @ q
        for j in range(r11.RP_OUT_DIM):
            assert got[(vid, j)] == y[j], (vid, j)


def test_rp_distance_contract_covers_all_pairs(spark, sf_smoke):
    """Band histogram accounting: every probe pair lands in exactly
    one band, so the counts must sum to C(n_probe, 2) over the
    nonzero-filtered probe set; bands are within [-1, len(edges)]."""
    from programmers_data_spark import registry
    from programmers_data_spark.queries import round11_ops as r11
    from programmers_data_spark.queries.similarity_ops import load_vectors

    registry.load_all()
    n = (
        load_vectors(spark, sf_smoke)
        .filter(f"vec_id < {r11.RP_N_PROBE}")
        .count()
    )
    rows = registry.QUERIES["rp_distance_contract"](spark, sf_smoke).collect()
    assert sum(r.n_pairs for r in rows) == n * (n - 1) // 2
    assert all(-1 <= r.band <= len(r11.RP_BAND_PCTS) for r in rows)


def test_triangle_counts_serial_reference(spark, sf_smoke):
    """Brute-force the frequent-pair graph's triangles with sets on
    the collected smoke fixture; per-node counts and degrees must
    match exactly (and the per-node sum must be 3x the number of
    distinct triangles)."""
    from collections import Counter
    from itertools import combinations

    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries import round11_ops as r11

    registry.load_all()
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    support = Counter(p for parts in baskets.values() for p in parts)
    frequent = {
        p for p, c in support.items() if c >= r11.TRI_MIN_PART_ORDERS
    }
    pair_cnt = Counter()
    for parts in baskets.values():
        for a, b in combinations(
            sorted(p for p in parts if p in frequent), 2
        ):
            pair_cnt[(a, b)] += 1
    edges = {p for p, c in pair_cnt.items() if c >= r11.TRI_MIN_PAIR_ORDERS}
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri_per_node = Counter()
    n_tri = 0
    for x in adj:
        for y in (n for n in adj[x] if n > x):
            for z in (n for n in (adj[x] & adj[y]) if n > y):
                n_tri += 1
                tri_per_node[x] += 1
                tri_per_node[y] += 1
                tri_per_node[z] += 1
    got = {
        r.node: (r.triangles, r.degree)
        for r in registry.QUERIES["triangle_counts"](
            spark, sf_smoke
        ).collect()
    }
    expected = {
        n: (c, len(adj[n])) for n, c in tri_per_node.items()
    }
    assert got == expected
    assert sum(c for c, _ in got.values()) == 3 * n_tri


def test_time_weighted_value_serial_reference(spark, sf_smoke):
    """Re-derive the TWAP per user with a plain loop: sort each
    user's events by (ts, event_id), hold each level for the whole-
    second gap to the next event, integer-divide at the end."""
    import math

    import pyspark.sql.functions as F

    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries import round11_ops as r11

    registry.load_all()
    ev = (
        load_table(spark, sf_smoke, "events")
        .select(
            "user_id", "event_id", "value",
            F.unix_micros("ts").alias("t_us"),
        )
        .collect()
    )
    byuser: dict[int, list] = {}
    for r in ev:
        byuser.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, rows in byuser.items():
        rows.sort(key=lambda r: (r.t_us, r.event_id))
        total = weighted = 0
        for cur, nxt in zip(rows, rows[1:]):
            dur = (nxt.t_us - cur.t_us) // r11.TWV_US_PER_S
            cents = math.floor(cur.value * r11.TWV_CENTS)
            total += dur
            weighted += cents * dur
        twap = weighted // total if total > 0 else None
        expected[uid] = (len(rows), total, weighted, twap)
    got = {
        r.user_id: (r.n_obs, r.total_s, r.weighted_cents_s, r.twap_cents)
        for r in registry.QUERIES["time_weighted_value"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expected


def test_wordpiece_greedy_hand_examples():
    """The greedy rule on a constructed vocab: longest match first,
    UNK advances one char."""
    from programmers_data_spark.queries import round11_ops as r11

    vocab = {"ab", "abc", "a", "b", "c", "d"}
    max_len = r11.UNI_MAX_PIECE_LEN

    def greedy(word):
        pos = ntok = nunk = 0
        while pos < len(word):
            for k in range(min(max_len, len(word) - pos), 0, -1):
                if word[pos : pos + k] in vocab:
                    pos += k
                    ntok += 1
                    break
            else:
                pos += 1
                ntok += 1
                nunk += 1
        return ntok, nunk

    assert greedy("abc") == (1, 0)      # whole-word piece wins
    assert greedy("abd") == (2, 0)      # ab + d (greedy, not a+b+d)
    assert greedy("abx") == (2, 1)      # ab + UNK(x)
    assert greedy("xxx") == (3, 3)      # all UNK, one char each


def test_wordpiece_encoded_counts_serial_reference(spark, sf_smoke):
    """Re-encode every document serially with the same vocab and the
    same greedy rule; totals must match the Arrow kernel exactly."""
    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.functions import textfn
    from programmers_data_spark.queries import round11_ops as r11

    registry.load_all()
    vocab = r11._wordpiece_vocab(spark, sf_smoke)
    max_len = r11.UNI_MAX_PIECE_LEN

    def greedy(word):
        pos = ntok = nunk = 0
        while pos < len(word):
            for k in range(min(max_len, len(word) - pos), 0, -1):
                if word[pos : pos + k] in vocab:
                    pos += k
                    ntok += 1
                    break
            else:
                pos += 1
                ntok += 1
                nunk += 1
        return ntok, nunk

    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", textfn.tokenize("text").alias("words"))
        .collect()
    )
    expected = {}
    for r in docs:
        t = u = 0
        for w in r.words:
            tw, uw = greedy(w)
            t += tw
            u += uw
        expected[r.doc_id] = (len(r.words), t, u)
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in registry.QUERIES["wordpiece_encoded_counts"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expected
    # the seed-derived vocab covers the fixture alphabet: no UNKs
    # on the driver fixtures (degenerate fixtures may differ)
    assert all(u == 0 for _, _, u in got.values())


def test_ks_drift_serial_reference(spark, sf_smoke):
    """Recompute the bucketed two-sample KS per source with plain
    dict arithmetic (source CDF vs rest CDF in ppm, max over the
    global bucket grid)."""
    from collections import Counter

    from programmers_data_spark import registry
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries import round11_ops as r11

    registry.load_all()
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("source", "n_chars")
        .collect()
    )
    per = Counter()
    for r in docs:
        b = min(r11.KS_N_BUCKETS - 1, r.n_chars // r11.KS_BUCKET_W)
        per[(r.source, b)] += 1
    sources = sorted({s for s, _ in per})
    buckets = sorted({b for _, b in per})
    n = len(docs)
    n_src = Counter(r.source for r in docs)
    expected = {}
    for s in sources:
        ns = n_src[s]
        if ns == 0 or n - ns == 0:
            expected[s] = (ns, None, None)
            continue
        scum = gcum = 0
        best = 0
        for b in buckets:
            scum += per.get((s, b), 0)
            gcum += sum(per.get((t, b), 0) for t in sources)
            rest = gcum - scum
            gap = abs(
                (scum * r11.KS_PPM) // ns
                - (rest * r11.KS_PPM) // (n - ns)
            )
            best = max(best, gap)
        expected[s] = (ns, best, best >= r11.KS_FLAG_PPM)
    got = {
        r.source: (r.n_docs, r.ks_ppm, r.drift_flag)
        for r in registry.QUERIES["ks_drift_by_source"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expected


def test_pipeline_funnel_contract_matches_curate_corpus(spark, sf_smoke, tmp_path):
    """The registered contract and the production pipeline must agree
    stage for stage — they share curation_stage_frames, and this test
    pins the wiring (a pipeline-side divergence like a re-added
    inline stage would slip past the oracle otherwise)."""
    from programmers_data_spark import registry
    from programmers_data_spark.pipelines import curate_corpus

    registry.load_all()
    funnel = curate_corpus(
        spark, sf_smoke, str(tmp_path / "tbl"), near_dup="best_quality"
    )
    rows = {
        r.stage: r.n_docs
        for r in registry.QUERIES["pipeline_funnel_contract"](
            spark, sf_smoke
        ).collect()
    }
    assert rows["raw"] == funnel["raw"]
    assert rows["quality_gated"] == funnel["quality_gated"]
    assert rows["exact_deduped"] == funnel["exact_deduped"]
    assert rows["near_deduped"] == funnel["near_deduped"]
    assert rows["split_train"] + rows["split_val"] == funnel["published"]
