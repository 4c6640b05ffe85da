"""100x scale probe (round-5 verdict task 4): one decade past the
standing 10x probes, on the three shuffle-heaviest shapes —

- q18_multiway_join : 5-way star join, 60M lineitem rows
- dd04_minhash_lsh_pairs : LSH candidate generation, 500k documents
- tx17_lm_familiarity : corpus bigram-LM build + probe join, 500k docs

Run: python tools/scale_probe100.py         (~15-30 min incl. build)

Replica construction (the honest part):

- join/group keys are shifted per replica (the 10x probe's rule), so
  join and group cardinalities scale with volume instead of collapsing
  onto the same keys;
- document TEXT is re-vocabularied per replica (every token suffixed
  with the replica tag, replica 0 verbatim): a verbatim 100x copy would
  make every document a 100-way exact near-dup, blowing LSH candidate
  pairs up by C(100,2) per original group — an artifact of the probe,
  not a property of real 100x corpora. With per-replica vocab the
  duplication RATE stays that of the base corpus (pairs scale ~100x,
  linearly), and tx17's LM vocabulary grows with the corpus — which is
  exactly the vocab-scale claim its docstring makes (real corpora grow
  vocab sublinearly per Heaps' law; per-replica suffixing is the
  conservative upper bound, ~100x vocab).

PASS criteria: per-query time ratio ~O(100x) or better with an
UNCHANGED plan fingerprint (summarize_plan at 1x == 100x). Superlinear
time with the same plan means a shape broke (lost broadcast, spill,
skew) — investigate .explain before trusting the operator at 100 TB.
Results are recorded in SCALE.md §"100x probe".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_etl_pipeline_spark.ops.plan_lint import plan_text, summarize_plan  # noqa: E402
from api_etl_pipeline_spark.registry import all_queries  # noqa: E402
from api_etl_pipeline_spark.session import get_spark  # noqa: E402
from api_etl_pipeline_spark.tables import TABLES, load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale100"
REPLICAS = 100
SHIFT = 100_000_000

KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    # round 9: events and embeddings join the replicated set so the
    # round-8 shuffle ops can be probed at 100x volume — timestamps and
    # values stay verbatim (dq07's per-day histogram windows must GROW
    # 100x within the same day spine, which is exactly the production
    # shape: more traffic, same calendar), and embedding vectors stay
    # verbatim (sim12's ADC scan cost is per-row; replica-0 query ids
    # survive the shift so the 5-query literal still resolves).
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}

# Frozen copy of the ROUND-8 replication spec — the spec any pre-marker
# (legacy `_READY`) data on disk was actually built under. The legacy
# migration below seeds per-table markers from THIS dict, never from the
# live KEY_SHIFT (round-9 advice): stamping the live spec onto pre-marker
# data would silently accept stale data if a table's spec changes in a
# later round while legacy data still exists.
_LEGACY_R8_KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
}

# The EXPLICIT set of tables a legacy (pre-per-table-marker) build can
# have materialized: the four r8-replicated tables plus the r8-era
# verbatim dims (round-10 advice). A table added to TABLES in a later
# round is never in this set, so the legacy branch can't seed a marker
# for data that was never built — it falls through to a fresh build at
# build time instead of failing with missing parquet at probe time.
_LEGACY_R8_TABLES = frozenset(
    {"lineitem", "orders", "customer", "documents",
     "region", "nation", "supplier", "part"}
)

QUERIES = [
    "q18_multiway_join",
    "dd04_minhash_lsh_pairs",
    "tx17_lm_familiarity",
    # round 7: incremental dedup joins the set — its delta/standing LSH
    # probe joins are the dd04 banded fact-fact class. (dd15 stays at
    # the 10x tier: its registered form fixes k=8 centroids, so a 100x
    # run with constant k would measure the known per-cell quadratic a
    # production k ~ n/target_cell_size explicitly avoids — see its
    # docstring and SCALE.md row.)
    "dd14_incremental_dedup",
    # round 8: DSIR importance scoring joins the set — its per-(doc,
    # bucket) count is the round's heaviest new corpus-scale shuffle,
    # and the re-vocabularied replicas grow the token stream honestly
    # while the hashed 1000-bucket feature space stays fixed (DSIR's
    # own design point: the model size is independent of corpus size).
    "samp07_dsir_importance",
    # round 9 (round-8 verdict task 4): the remaining round-8 ops whose
    # corpus-scale stage deserves a second decade —
    # dq07: the daily-histogram agg is the only corpus-scale stage;
    # everything past the two histograms is 15-bucket spine algebra.
    "dq07_window_psi_drift",
    # cur06: per-row JVM regex + ONE hash agg; text never shuffles, so
    # wall must track the scan, not any exchange.
    "cur06_pii_scrub",
    # sim12: the scored stream grows 100x but the WindowGroupLimit
    # Partial below the exchange must keep the exchange at k·|Q| rows
    # per input partition — the plan-shape claim this probe tests.
    "sim12_pq_topk",
    # round 9: the composed curation funnel at its second decade — the
    # per-row wrap/extract/scrub chain is scan-bound, the flag windows
    # move only narrow keys, and DSIR's (doc,bucket) shuffle is the one
    # corpus-scale exchange. Replica id-shifts preserve every injection
    # modulus (SHIFT % 10 = % 2 = % 5 = 0) and div-100 URL groups never
    # cross replicas, so the funnel rates stay scale-stable.
    "llm04_curation_funnel",
    # round 9: FD mining at its second decade — the one continuation-op
    # whose 10x row scales with volume (key-like lhs hypotheses emit
    # ~|rows| partial-agg pairs). The probe documents that exact-FD
    # mining cost honestly; the replica key-shifts keep o_orderkey a
    # true key at 100x, while shared o_totalprice values across
    # replicas legitimately FLIP the near-uniqueness verdict —
    # profiles are data-dependent, which is their point.
    "dq08_fd_profile",
    # round 10 (round-9 verdict task 2): the exact-threshold prefix-filter
    # join at its second decade — the RE-VOCABULARIED replicas are the
    # point: verbatim 10x replicas made dd18's 10x row output-bound
    # (every doc a 10-way clone, ~9000x qualifying pairs), while distinct
    # per-replica vocabularies keep cross-replica shingles disjoint, so
    # this probe measures candidate-PRUNING power (prefix join fan-out
    # under a 100x-bigger, 100x-wider-vocab corpus), not output
    # enumeration. Skew watch: if the prefix equi-join's df-heavy
    # shingles bite, the recorded fix is df-bucket salting.
    "dd18_prefix_filter_join",
    # round 10: dq09's whole point is the K-bound — the 100x row is the
    # measured contrast against dq08's 9.6x exact-mining cost at the
    # same decade (the profile aggs see <= DQ09_GROUPS groups here).
    "dq09_fd_profile_sampled",
    # round 10: the span-hash keep-first shuffle at its second decade;
    # re-vocabularied replicas keep natural repeats replica-local, so
    # the window measures hash-shuffle scaling, not clone enumeration.
    "dd19_span_dedup",
    # round 10: the pseudonymization audit is O(distinct ids) by
    # design — both events and customer replicate with shifted keys,
    # so the union-id domain genuinely grows 100x.
    "cur09_pseudonymize_ids",
    # round 10: ev19 re-probed at the second decade after the
    # EV19_CAP guard — 100x users at constant journey length, the
    # production growth mode; the guard must add no exchange.
    "ev19_journey_patterns",
    # round 11: the reconciliation merge at its second decade — the
    # hash-compare and anti-join legs move (key, hash) projections only,
    # so the wall must track the scan like ing19's MERGE class.
    "ing22_reconcile_by_hash",
    # round 11: stride-1 substring dedup — re-vocabularied replicas keep
    # windows replica-local, so this measures the 16-byte-triple
    # keep-first shuffle at ~W x the dd19 volume, linear in tokens.
    "dd21_substring_dedup",
    # round 11: production-k SemDeDup at the DESIGNED stress point — k
    # grows 63 -> 6250 with the corpus, so within-cell pair work stays
    # bounded but the flat codebook-literal assignment is O(n*k*d); this
    # probe exists to measure where that term starts dominating (its
    # SCALE.md row names the two-level-codebook fix if it does).
    "dd20_semdedup_production_k",
    # round 11: the two-level fix itself — coarse-then-fine assignment
    # (O(n*sqrt(k)*d)) with a constant-size plan; probed at the same
    # decade as dd20 so the contrast row is apples-to-apples. Round 12:
    # at this decade the 3.2 MiB codebook crosses DD22_LITERAL_MAX_BYTES,
    # so this row now measures the BROADCAST+Arrow production path (and
    # the numpy-vectorized fine->super grouping) — the r11 verdict's
    # "re-run 100x probe" for the off-the-literal fix.
    "dd22_semdedup_two_level",
    # round 12: trained-codebook SemDeDup at the second decade — 3
    # broadcast assignments (k2=6250 via k1=80 supers) plus 2 spherical
    # updates whose k2*d stats collects are the only driver traffic;
    # the training loop's cost must track the corpus scans, not k.
    "dd23_semdedup_trained",
    # round 12: the incremental refresh at the second decade — the
    # standing codebook grows with the store but the verdict join must
    # stay bounded by DELTA cell occupancy (the dd14 argument).
    "dd24_incremental_semdedup",
    # round 12: IVFPQ read path — code scan (~1/64 payload) x probe
    # pruning (~2/8 cells) must multiply; the top-k window exchange
    # stays query-bounded. Replica-0 ids survive the shift, so the
    # 8-centroid/5-query literals resolve identically at 100x.
    "sim15_ivfpq_topk",
    # round 14 (r13 verdict task 4): containment dedup at the second
    # decade — its 10x ratio is 2.6x (pair-bounded by design: gram
    # joins ride the LSH candidate set, and re-vocabularied replicas
    # keep candidates replica-local, so the pair set scales with the
    # dup rate, not quadratically). The 100x row tests that the
    # candidate-bounded claim survives a 100x-wider vocab.
    "dd13_containment_dedup",
]


def build_100x(spark) -> float:
    # Per-table markers carrying the table's replication spec: a table is
    # rebuilt only when its spec changed (round 9 added events/embeddings
    # to KEY_SHIFT — the expensive re-vocabularied documents build from
    # the prior run is reused as-is).
    legacy = Path(OUT) / "_READY"
    t0 = time.perf_counter()
    Path(OUT).mkdir(parents=True, exist_ok=True)
    reps = F.broadcast(spark.range(REPLICAS).withColumnRenamed("id", "_rep"))
    for name in TABLES:
        spec = repr(KEY_SHIFT.get(name))
        marker = Path(OUT) / f"_READY_{name}"
        if marker.exists() and marker.read_text() == spec:
            continue
        if legacy.exists() and not marker.exists() and name in _LEGACY_R8_TABLES:
            # data on disk predates per-table markers; it was built under
            # the FROZEN round-8 spec, so seed the marker with that spec
            # (not the live one). If the live spec has since diverged the
            # `marker.read_text() == spec` check above falls through on
            # the next run and the table is rebuilt.
            marker.write_text(repr(_LEGACY_R8_KEY_SHIFT.get(name)))
            if marker.read_text() == spec:
                continue
        df = load_table(spark, SF_DIR, name)
        if name in KEY_SHIFT:
            r = df.crossJoin(reps)
            for col in KEY_SHIFT[name]:
                r = r.withColumn(col, F.col(col) + F.col("_rep") * SHIFT)
            if name == "documents":
                # re-vocabulary per replica: suffix every token with the
                # replica tag (replica 0 verbatim) — see module docstring
                r = r.withColumn(
                    "text",
                    F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                        F.regexp_replace(
                            F.col("text"),
                            F.lit(r"(\S+)"),
                            F.concat(F.lit("$1zz"), F.col("_rep").cast("string")),
                        )
                    ),
                )
            r.drop("_rep").repartition(64).write.mode("overwrite").parquet(
                f"{OUT}/{name}.parquet"
            )
        else:
            df.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        marker.write_text(spec)
    dt = time.perf_counter() - t0
    legacy.write_text("ok")
    return round(dt, 1)


def time_query(spark, fn, sf_dir: str, runs: int = 2) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    best = None
    for _ in range(runs):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = get_spark("scale-probe-100x")
    import bench

    base_dir, _ = bench.prepare_layout(spark, SF_DIR, 32)
    build_sec = build_100x(spark)
    print(f"100x build: {build_sec}s", flush=True)

    specs = all_queries()
    rows = []
    # optional argv filter: probe only the named queries (substring match)
    wanted = sys.argv[1:]
    names = [
        q for q in QUERIES if not wanted or any(w in q for w in wanted)
    ]
    for name in names:
        fn = specs[name].fn
        fp1 = summarize_plan(plan_text(fn(spark, base_dir)))
        t1 = time_query(spark, fn, base_dir)
        print(f"{name} 1x: {t1}s", flush=True)
        fp100 = summarize_plan(plan_text(fn(spark, OUT)))
        t100 = time_query(spark, fn, OUT)
        print(f"{name} 100x: {t100}s", flush=True)
        same = fp1 == fp100
        rows.append({
            "query": name, "sec_1x": t1, "sec_100x": t100,
            "ratio": round(t100 / t1, 1) if t1 else None,
            "plan_unchanged": same,
            "fingerprint_1x": fp1,
            **({} if same else {"fingerprint_100x": fp100}),
        })

    # round 14 (r13 verdict task 4): the shared CC construction wall —
    # not a registered query (it is driver-iterated query-construction
    # work), so it is timed at its build site: cache cleared, then one
    # full dd04_components build + materialization per decade. The
    # number that matters at scale is iterations x per-round cost; the
    # size dispatch means 1x (3k edges, sf0.1) runs the driver
    # union-find while a decade that crosses CC_DRIVER_MAX_EDGES runs
    # the distributed pointer-jumping loop — a DESIGNED path flip, so
    # no plan-fingerprint comparison applies (recorded as such).
    if not wanted or any(w in "cc_construction" for w in wanted):
        from api_etl_pipeline_spark.llm_ops import dedup as _dedup

        cc = {}
        for tag, d in (("1x", base_dir), ("100x", OUT)):
            _dedup._COMPONENTS_CACHE.clear()
            _dedup.SHARED_BUILD_WALLS.clear()
            t0 = time.perf_counter()
            comp = _dedup.dd04_components(spark, d)
            comp.write.mode("overwrite").format("noop").save()
            cc[tag] = round(time.perf_counter() - t0, 3)
            n_edges = _dedup.dd04_minhash_lsh_pairs(spark, d).count()
            path = (
                "driver-uf" if n_edges <= _dedup.CC_DRIVER_MAX_EDGES
                else "distributed"
            )
            print(
                f"cc_construction {tag}: {cc[tag]}s "
                f"({n_edges} edges, {path})", flush=True
            )
        rows.append({
            "query": "cc_construction(dd04_components)",
            "sec_1x": cc["1x"], "sec_100x": cc["100x"],
            "ratio": round(cc["100x"] / cc["1x"], 1) if cc["1x"] else None,
            "plan_unchanged": None,  # designed dispatch flip, see above
        })

    print(f"{'query':28s} {'1x':>8s} {'100x':>9s} {'ratio':>7s}  plan")
    for r in rows:
        shape = (
            "dispatch-flip" if r["plan_unchanged"] is None
            else ("unchanged" if r["plan_unchanged"] else "CHANGED")
        )
        print(
            f"{r['query']:28s} {r['sec_1x']:8.3f} {r['sec_100x']:9.3f} "
            f"{r['ratio']:7.1f}  {shape}"
        )
    print(json.dumps({"build_sec": build_sec, "probes": rows}))


if __name__ == "__main__":
    main()
