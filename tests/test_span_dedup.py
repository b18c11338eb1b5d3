"""Exact-substring span dedup (Lee et al. 2022 ExactSubstr): detection
parity against a pure-python brute force, span-merge semantics, canonical
survivor policy, and the plan guarantees of the removal composition."""

import random

from pyspark.sql import functions as F

from list_extractor_spark.tda.dedup import dup_span_windows, remove_dup_spans

W = 4  # small window so crafted corpora stay readable


def _brute_windows(rows, w=W, min_count=2):
    """Pure-python reference: (doc_id, pos, n_occurrences, is_canonical)."""
    wins = []
    for doc_id, text in rows:
        toks = text.strip(" ").split()
        for p in range(1, len(toks) - w + 2):
            wins.append((doc_id, p, " ".join(toks[p - 1 : p - 1 + w])))
    by_gram = {}
    for doc_id, p, g in wins:
        by_gram.setdefault(g, []).append((doc_id, p))
    out = []
    for g, occ in by_gram.items():
        if len(occ) < min_count:
            continue
        first = min(occ)
        for doc_id, p in occ:
            out.append((doc_id, p, len(occ), (doc_id, p) == first))
    return sorted(out)


def _brute_removal(rows, w=W, min_count=2, keep_first=True):
    """Pure-python reference for remove_dup_spans(affected_only=True)."""
    rm = [
        (d, p)
        for d, p, _, canon in _brute_windows(rows, w, min_count)
        if not (keep_first and canon)
    ]
    by_doc = {}
    for d, p in rm:
        by_doc.setdefault(d, []).append(p)
    out = []
    for doc_id, text in rows:
        if doc_id not in by_doc:
            continue
        toks = text.strip(" ").split()
        merged = []
        for p in sorted(by_doc[doc_id]):
            s, e = p, p + w
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = set()
        for s, e in merged:
            covered.update(range(s, e))
        kept = [t for i, t in enumerate(toks, start=1) if i not in covered]
        if kept:
            out.append(
                (
                    doc_id,
                    " ".join(kept),
                    len(merged),
                    sum(e - s for s, e in merged),
                    len(kept),
                )
            )
    return sorted(out)


_SHARED = "alpha beta gamma delta epsilon zeta"  # 6 tokens: 3 dup 4-windows


def _rows():
    return [
        ("a", f"one two {_SHARED} three four five six seven"),
        ("b", f"ten twenty {_SHARED} thirty forty fifty sixty"),
        ("c", "unrelated words that never repeat anywhere else at all"),
        ("d", _SHARED),  # every token duplicated -> fully covered, dropped
    ]


def test_dup_span_windows_matches_brute_force(spark):
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    got = sorted(map(tuple, dup_span_windows(df, w=W).collect()))
    assert got == _brute_windows(_rows())
    assert got, "crafted corpus must produce duplicated windows"


def test_dup_span_windows_random_property(spark):
    """Random corpora with planted shared passages: Spark == brute force
    (several seeds; planted spans long enough to straddle window merges)."""
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        planted = " ".join(rng.choice(vocab) for _ in range(9))
        rows = []
        for i in range(12):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 15))]
            if i % 3 == 0:  # a third of docs quote the planted passage
                cut = rng.randrange(0, len(toks) + 1)
                toks = toks[:cut] + planted.split() + toks[cut:]
            rows.append((f"d{i:02d}", " ".join(toks)))
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = sorted(map(tuple, dup_span_windows(df, w=W).collect()))
        assert got == _brute_windows(rows), f"seed {seed}"
        assert got, f"seed {seed} produced no duplicated windows"


def test_remove_dup_spans_matches_brute_force(spark):
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    got = sorted(
        map(tuple, remove_dup_spans(df, w=W, affected_only=True).collect())
    )
    assert got == _brute_removal(_rows())


def test_remove_dup_spans_merges_overlapping_windows(spark):
    """A duplicated passage longer than w yields ONE maximal span, not one
    span per window: b's copy of a's 6-token passage (3 overlapping
    4-windows) is removed as a single 6-token cut."""
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in remove_dup_spans(df, w=W, affected_only=True).collect()
    }
    assert out["b"]["n_spans"] == 1
    assert out["b"]["n_tokens_removed"] == 6
    assert out["b"]["text"] == "ten twenty thirty forty fifty sixty"


def test_remove_dup_spans_keeps_canonical_occurrence(spark):
    """keep_first: the globally-first copy (doc a, min (doc_id, pos))
    keeps its passage; keep_first=False cuts every copy."""
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    kept_first = {
        r["doc_id"]: r["text"]
        for r in remove_dup_spans(df, w=W, affected_only=True).collect()
    }
    assert "a" not in kept_first  # canonical copy untouched
    cut_all = {
        r["doc_id"]: r["text"]
        for r in remove_dup_spans(
            df, w=W, keep_first=False, affected_only=True
        ).collect()
    }
    assert cut_all["a"] == "one two three four five six seven"


def test_remove_dup_spans_drops_fully_covered_and_passes_untouched(spark):
    """Full output: doc d (entirely duplicated text) is dropped, doc c
    passes through byte-identical with zero accounting."""
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    out = {r["doc_id"]: r for r in remove_dup_spans(df, w=W).collect()}
    assert "d" not in out
    assert out["c"]["text"] == dict(_rows())["c"]
    assert out["c"]["n_spans"] == 0 and out["c"]["n_tokens_removed"] == 0
    assert out["a"]["text"] == dict(_rows())["a"]  # canonical copy intact


def test_remove_dup_spans_accepts_precomputed_windows(spark):
    """Passing a materialized detection result (the share-the-pass form)
    must produce identical removal output to the self-computing form."""
    df = spark.createDataFrame(_rows(), "doc_id string, text string")
    wins = dup_span_windows(df, w=W).localCheckpoint(eager=True)
    a = sorted(map(tuple, remove_dup_spans(
        df, w=W, affected_only=True, windows=wins).collect()))
    b = sorted(map(tuple, remove_dup_spans(
        df, w=W, affected_only=True).collect()))
    assert a == b and a


def test_remove_dup_spans_plan_broadcasts_small_sides(spark):
    """Under AQE the removal composition must not re-shuffle the corpus for
    its small-by-construction sides: the span-table join and the untouched
    anti-join both resolve to broadcast form."""
    df = spark.createDataFrame(
        [(str(i), f"filler{i} " * 3 + _SHARED) for i in range(200)],
        "doc_id string, text string",
    )
    out = remove_dup_spans(df, w=W)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("== Initial Plan ==")[0]
    anti = [ln for ln in final.splitlines() if "LeftAnti" in ln]
    assert anti and all("BroadcastHashJoin" in ln for ln in anti), final
