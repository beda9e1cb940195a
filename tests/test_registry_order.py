"""Evidence-driven registry ordering (no Spark needed).

The driver samples a ~50-entry prefix of queries() per round, so the
ordering IS the evidence strategy: never-hash-verified oracle-backed
queries first (new queries and rows-only->oracle promotions), crashed
queries next (they owe a clean row), then hash-verified queries
rotating oldest-evidence-first, rows-only last. These tests pin that
contract against the real CORRECTNESS artifacts in the repo root.
"""

from recommendation_system_spark_ml_spark.registry import (
    _driver_evidence, all_specs)


def test_prefix_is_unverified_then_rotation():
    specs = all_specs()
    ev = _driver_evidence()
    names = list(specs)

    def pri(n):
        e = ev.get(n, {"last_green": -1, "last_hash": -1, "crashed": False})
        if specs[n].oracle is not None and e["last_hash"] < 0:
            return 0
        if specs[n].oracle is None and n not in ev:
            return 0.5  # never driver-sampled: owes one rows-only row
        if e["crashed"]:
            return 1
        return 2 if specs[n].oracle is not None else 3

    pris = [pri(n) for n in names]
    assert pris == sorted(pris), "priority classes must be contiguous"

    # within the hash-verified class, evidence rounds never decrease
    hashed = [ev[n]["last_hash"] for n in names if pri(n) == 2]
    assert hashed == sorted(hashed), "rotation must be oldest-first"

    # rows-only queries WITH driver evidence all sit at the back
    first_rows_only = next(
        (i for i, n in enumerate(names) if pri(n) == 3), len(names))
    assert all(pri(n) == 3 for n in names[first_rows_only:])


def test_never_sampled_rows_only_enter_prefix_once():
    """A no-oracle query absent from every CORRECTNESS artifact sorts
    ahead of rotation (it owes one driver spark_rows row); once any
    artifact records it, it falls back to the rows-only tail."""
    specs = all_specs()
    ev = _driver_evidence()
    names = list(specs)
    never = [n for n, s in specs.items() if s.oracle is None and n not in ev]
    sampled_rows_only = [n for n, s in specs.items()
                         if s.oracle is None and n in ev]
    if never and sampled_rows_only:
        worst_never = max(names.index(n) for n in never)
        best_sampled = min(names.index(n) for n in sampled_rows_only)
        assert worst_never < best_sampled, (worst_never, best_sampled)
    # and they precede the hash-verified rotation class entirely
    rotation = [n for n, s in specs.items()
                if s.oracle is not None
                and ev.get(n, {"last_hash": -1})["last_hash"] >= 0]
    if never and rotation:
        assert max(names.index(n) for n in never) < min(
            names.index(n) for n in rotation)


def test_promotion_leads_prefix():
    """A query with only rows-only evidence that NOW has an oracle
    (a promotion) must sort into the un-hash-verified front class,
    not hide behind its old rows-only green row."""
    specs = all_specs()
    ev = _driver_evidence()
    promoted = [n for n, s in specs.items()
                if s.oracle is not None
                and ev.get(n, {}).get("last_hash", -1) < 0
                and ev.get(n, {}).get("last_green", -1) >= 0]
    if not promoted:  # nothing promoted in this checkout's artifacts
        return
    names = list(specs)
    n_front = len([n for n in names
                   if specs[n].oracle is not None
                   and ev.get(n, {"last_hash": -1})["last_hash"] < 0])
    front = set(names[:n_front])
    assert all(p in front for p in promoted), (promoted, names[:10])


def test_crashed_query_owes_a_row():
    """A query whose last sampled run crashed (and has no later green
    row) sorts ahead of every already-verified query."""
    ev = _driver_evidence()
    # synthetic check of the classifier itself on the known r5 crash
    # shape: agg_approx_percentile crashed in r5 and (until the r6
    # artifact lands) must carry crashed=True OR a later green row.
    row = ev.get("agg_approx_percentile")
    if row is None:
        return
    assert row["crashed"] or row["last_green"] >= 6, row
