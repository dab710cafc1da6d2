"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing includes full execution of each query plan (results drained via
count/collect of a small output), with the session warmed up first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


# C1-only JIT for the single-JVM bench harness. Root cause of the bimodal
# 8s-vs-34s swings on identical code (SURVEY 6.6): Spark generates FRESH
# classes per query invocation (codegen stage ids in class names), so C2
# re-profiles and re-compiles 20-30 CPU-seconds of run-once code every
# single entry — measured jit_ms per run drops from ~25,000 to ~100 under
# C1, and hashdiff_lineitem_dupkeys goes from bimodal 8-34s to a stable
# 5s. This is a HARNESS setting: a long-lived cluster executing the same
# generated classes for hours wants full tiered compilation.
BENCH_JVM_FLAGS = "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m"

# A/B outlier rule: a first-pass min-ratio above this triggers an automatic
# same-workers re-run at >= SPOTCHECK_REPEATS samples per side (see
# run_interleaved). 1.3 splits the observed noise band (cold-start samples
# land 1.1-1.25x) from the real-regression band every adjudicated case to
# date has fallen in.
SPOTCHECK_RATIO = float(os.environ.get("SPARK_GRAFT_SPOTCHECK_RATIO", "1.3"))
SPOTCHECK_REPEATS = int(os.environ.get("SPARK_GRAFT_SPOTCHECK_REPEATS", "5"))


def build_session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", BENCH_JVM_FLAGS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("data-diff-spark-bench")
        .getOrCreate()
    )


def run_interleaved(ref: str, sf_dir: str, cpus: str, repeats: int,
                    names, sf) -> None:
    """A/B mode (SPARK_GRAFT_BENCH_BASELINE=<git-ref>): two persistent
    workers — HEAD tree and a worktree of `ref` — each holding a warm
    SparkSession; every entry runs ALTERNATELY on both, repeats times, in
    one machine state. Reported per-entry ratios (head/base, min-of-repeats
    each side) are drift-free: any cross-run claim ("X regressed 2x") made
    from two separate bench runs conflates code with machine state, which
    is exactly how two past rounds misread their trajectories.

    Evidence discipline (round-7 hardening, after two runs of this
    protocol disagreed 2x on one entry pair): every run writes its full
    result — ALL samples per side, min AND spread, plus the parquet paths
    each side's cross-engine oracle actually scanned — to
    `AB_vs_<ref>.json` (override: SPARK_GRAFT_AB_OUT). A SURVEY ratio
    claim without its committed artifact is hearsay. A worker that dies is
    marked dead (no further requests — a write to its closed stdin used
    to raise BrokenPipeError and abort the surviving side's run too);
    remaining entries record per-entry errors for the dead side and real
    timings for the live one."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    wt = os.path.join(root, ".scratch", "benchref",
                      ref.replace("/", "_").replace("~", "_"))
    if not os.path.isdir(os.path.join(wt, "data_diff_spark")):
        subprocess.run(["git", "worktree", "add", "--detach", "-f", wt, ref],
                       cwd=root, check=True, capture_output=True)

    def spawn(tree: str) -> subprocess.Popen:
        env = dict(os.environ, SPARK_GRAFT_BENCH_TREE=tree,
                   SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
        return subprocess.Popen(
            [sys.executable, os.path.join(root, "tools", "bench_worker.py")],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, env=env, cwd=tree,
        )

    dead: set = set()

    def ask(w: subprocess.Popen, name: str) -> dict:
        if id(w) in dead:
            return {"entry": name, "err": "worker died (earlier)"}
        try:
            if name is not None:
                w.stdin.write(name + "\n")
                w.stdin.flush()
            while True:
                line = w.stdout.readline()
                if not line:
                    dead.add(id(w))
                    return {"entry": name, "err": "worker died"}
                if line.startswith("##AB## "):
                    return json.loads(line[7:])
        except (BrokenPipeError, OSError) as e:
            dead.add(id(w))
            return {"entry": name, "err": f"worker died: {type(e).__name__}"}

    head_w, base_w = spawn(root), spawn(wt)
    ask(head_w, None), ask(base_w, None)  # wait for both ready lines
    head, base, ratios, errors = {}, {}, {}, {}
    samples = {"head": {}, "base": {}}
    scans = {"head": {}, "base": {}}
    loads = {"head": {}, "base": {}}
    for name in names:
        hs, bs = [], []
        for _ in range(repeats):
            for w, acc, side in ((head_w, hs, "head"), (base_w, bs, "base")):
                r = ask(w, name)
                if "sec" in r:
                    acc.append(r["sec"])
                    if "load1m" in r:
                        loads[side].setdefault(name, []).append(r["load1m"])
                    if r.get("oracle_scans"):
                        scans[side][name] = r["oracle_scans"]
                elif "err" in r:
                    errors.setdefault(f"{side}:{name}", r["err"])
        samples["head"][name], samples["base"][name] = hs, bs
        if hs:
            head[name] = min(hs)
        if bs:
            base[name] = min(bs)
        if hs and bs:
            ratios[name] = round(min(hs) / min(bs), 3)
    # Mechanical outlier adjudication (round-9 rule): any entry whose
    # min-ratio exceeds SPOTCHECK_RATIO after the main pass is re-run on
    # the SAME warm workers at >=SPOTCHECK_REPEATS per side, and the extra
    # samples fold into the artifact. Rationale: the r8 round shipped a
    # 1.45x/2.54x reading on one entry that a repeats=5 re-run exonerated
    # at 0.955 — low-repeat cold samples misread memory state as code.
    # This used to be a per-round judgment call; now no >threshold ratio
    # can leave this function unadjudicated.
    spotcheck = {"threshold": SPOTCHECK_RATIO, "repeats": SPOTCHECK_REPEATS,
                 "entries": {}}
    for name in sorted(n for n, r in ratios.items() if r > SPOTCHECK_RATIO):
        extra = max(0, SPOTCHECK_REPEATS - repeats)
        hs, bs = [], []
        for _ in range(repeats + extra):
            for w, acc in ((head_w, hs), (base_w, bs)):
                r = ask(w, name)
                if "sec" in r:
                    acc.append(r["sec"])
        if not (hs and bs):
            spotcheck["entries"][name] = {"err": "worker died during re-run"}
            continue
        all_h = samples["head"][name] + hs
        all_b = samples["base"][name] + bs
        import statistics as _st
        adjudicated = round(min(all_h) / min(all_b), 3)
        spotcheck["entries"][name] = {
            "first_pass_ratio": ratios[name],
            "rerun_samples_head": hs, "rerun_samples_base": bs,
            "adjudicated_ratio": adjudicated,
            "adjudicated_median_ratio": round(
                _st.median(all_h) / _st.median(all_b), 3),
        }
        samples["head"][name], samples["base"][name] = all_h, all_b
        head[name], base[name] = min(all_h), min(all_b)
        ratios[name] = adjudicated
    for w in (head_w, base_w):
        try:
            if id(w) not in dead:
                w.stdin.write("QUIT\n")
                w.stdin.flush()
            w.wait(timeout=60)
        except Exception:  # noqa: BLE001
            w.kill()
    import statistics

    med = {
        side: {n: round(statistics.median(v), 3)
               for n, v in samples[side].items() if v}
        for side in ("head", "base")
    }
    med_ratios = {
        n: round(med["head"][n] / med["base"][n], 3)
        for n in med["head"] if n in med["base"] and med["base"][n]
    }
    common = [n for n in head if n in base]
    th, tb = sum(head[n] for n in common), sum(base[n] for n in common)
    spread = {
        n: round(max(samples["head"][n] + samples["base"][n])
                 / max(1e-9, min(samples["head"][n] + samples["base"][n])), 3)
        for n in common
        if samples["head"][n] and samples["base"][n]
    }
    out = {
        "metric": "workload_ab", "ref": ref, "unit": "sec", "sf": sf,
        "repeats": repeats, "cpus": cpus,
        "total_head": round(th, 3), "total_base": round(tb, 3),
        "ratio_total": round(th / tb, 3) if tb else None,
        "queries": head, "baseline": base, "ratios": ratios,
        "medians": med, "median_ratios": med_ratios,
        "samples": samples, "spread": spread, "oracle_scans": scans,
        "load1m": loads, "spotcheck": spotcheck,
    }
    if errors:
        out["errors"] = errors
    art = os.environ.get(
        "SPARK_GRAFT_AB_OUT",
        os.path.join(root, f"AB_vs_{ref.replace('/', '_')}.json"))
    try:
        with open(art, "w") as f:
            json.dump(out, f, indent=1)
        out["artifact"] = art
    except OSError:
        pass
    print(json.dumps(out))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf) if sf.replace(".", "").isdigit() else sf

    baseline = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    if baseline:
        from data_diff_spark.workload import WORKLOAD as _W

        only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
        names = ([t.strip() for t in only.split(",") if t.strip()]
                 if only else list(_W))
        unknown = [n for n in names if n not in _W]
        if unknown:
            print(json.dumps({"error": f"unknown bench entries: {unknown}"}))
            sys.exit(2)
        run_interleaved(
            baseline, sf_dir, cpus,
            int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")), names, sf)
        return

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from data_diff_spark.workload import WORKLOAD, load_views, warm_streaming

    # Warm the JVM + parquet footers + streaming/metastore machinery once;
    # not counted. A warm-up failure must not kill the run — each query
    # re-attempts load_views itself and reports its own error.
    try:
        load_views(spark, sf_dir)
        spark.table("lineitem").count()
        warm_streaming(spark, sf_dir)
    except Exception:  # noqa: BLE001
        pass

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    # Optional comma-separated entry filter (scale probes re-run just the
    # expensive entries at sf1.0; the driver's per-round run leaves it unset).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [t.strip() for t in only.split(",") if t.strip()]
        unknown = [n for n in names if n not in WORKLOAD]
        if unknown:
            # a typo'd filter must fail loudly, not record a 0-second run
            print(json.dumps({"error": f"unknown bench entries: {unknown}",
                              "known": sorted(WORKLOAD)}))
            sys.exit(2)
        selected = {k: WORKLOAD[k] for k in names}
    else:
        selected = WORKLOAD
    timings = {}
    errors = {}
    for name, (fn, _oracle) in selected.items():
        best = None
        # One failing query must degrade to an `errors` entry, never zero
        # the whole benchmark (round 2 lost its entire BENCH to one
        # ingest-time schema change).
        try:
            for _ in range(repeats):
                t0 = time.time()
                df = fn(spark, sf_dir)
                # One full execution of the plan, all columns materialized,
                # no driver-side transfer: the noop sink.
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 - survey-style harness
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        # Operators persist multi-use subtrees; drop them between queries so
        # accumulated cache memory doesn't distort later timings.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "workload_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
