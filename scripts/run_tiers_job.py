"""Tier-rollup job entrypoint — the ``ray job submit`` surface.

    ray job submit -- python scripts/run_tiers_job.py \
        --input /data/transcripts --out /data/tiers \
        [--key conv_id --date-column ts --value-column value] \
        [--partitions 256] [--gap-fill] [--encode] [--no-resume] \
        [--ingest /data/new_batch] [--expire 1m=2024-01-10,1h=2023-01-01]

Runs the fused raw→1m→1h→1d cascade with per-partition lineage manifests
(resume-after-failure: re-submitting the same job skips committed
partitions), optionally Gorilla/delta-of-delta-encodes each tier into chunk
tables, and writes a metrics JSON next to the output.

Operational modes: ``--ingest NEW_PARQUET`` folds a new raw batch into an
existing tier store via partition-level invalidation (bit-equal to a full
recompute; touched partitions only); ``--expire tier=cutoff,...`` applies a
retention policy, atomically dropping buckets older than each tier's cutoff.

Owns its Ray session (guarded init — under ``ray job submit`` the cluster
address is picked up from the environment)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet file/dir of transcripts")
    ap.add_argument("--out", required=True, help="output root for tiers + manifests")
    ap.add_argument("--key", default="conv_id")
    ap.add_argument("--date-column", default="ts")
    ap.add_argument("--value-column", default="value")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--tiers", default="1min,1h,1D")
    ap.add_argument("--gap-fill", action="store_true")
    ap.add_argument("--salt", type=int, default=None,
                    help="hot-conversation salting factor (tier-1 bucket hash)")
    ap.add_argument("--encode", action="store_true",
                    help="also write Gorilla/DoD chunk tables per tier")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--ingest", default=None, metavar="NEW_PARQUET",
                    help="fold a new raw batch into the existing store "
                         "(partition-level invalidation; --input = base raw)")
    ap.add_argument("--expire", default=None, metavar="TIER=CUTOFF,...",
                    help="retention policy, e.g. 1m=2024-01-10,1h=2023-06-01")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pytimetk_ray.pipelines.tiers import TIER_NAMES, rollup_tiers
    from pytimetk_ray.stages.tier_encoder import TierEncoder
    from pytimetk_ray.state.manifest import fingerprint_inputs

    paths = args.input
    if os.path.isdir(paths):
        files = [os.path.join(paths, f) for f in sorted(os.listdir(paths)) if f.endswith(".parquet")]
    else:
        files = [paths]
    fp = fingerprint_inputs(files, {"tiers": args.tiers, "gap_fill": args.gap_fill})

    t0 = time.time()
    ds = rd.read_parquet(paths, columns=[args.key, args.date_column, args.value_column])
    tiers = tuple(args.tiers.split(","))
    if args.ingest:
        from pytimetk_ray.pipelines.tiers import ingest_increment

        if args.salt:
            raise SystemExit(
                "--ingest does not support salted stores (stage-A salted "
                "partitions key on (conv, bucket-hash)); re-run the full "
                "rollup with --salt instead")
        if args.no_resume:
            raise SystemExit(
                "--ingest is inherently a resume operation (untouched "
                "partitions must be reused); drop --no-resume")
        # raw is the source of truth: recomputed partitions come back
        # UNEXPIRED.  Detect a previously-expired store and make the operator
        # re-apply the retention policy (conveniently, --expire in the same
        # run executes AFTER the ingest below).
        from pytimetk_ray.state.manifest import partition_fingerprints

        expired_tiers = [
            n for n in (TIER_NAMES.get(f, f) for f in tiers)
            if any("|expire@" in v
                   for v in partition_fingerprints(args.out, n).values())
        ]
        if expired_tiers and not args.expire:
            print(
                f"WARNING: tiers {expired_tiers} carry |expire@ manifests; "
                "--ingest recomputes touched partitions FROM RAW, undoing "
                "their expiry. Pass --expire tier=cutoff,... in this run "
                "(applied after the ingest) to re-apply the retention policy.",
                file=sys.stderr)
        new_ds = rd.read_parquet(
            args.ingest, columns=[args.key, args.date_column, args.value_column])
        res = ingest_increment(
            ds, new_ds, out_dir=args.out, key=args.key,
            date_column=args.date_column, value_column=args.value_column,
            tiers=tiers, num_partitions=args.partitions,
            input_fingerprint=fp, gap_fill=args.gap_fill,
        )
    else:
        res = rollup_tiers(
            ds, out_dir=args.out, key=args.key, date_column=args.date_column,
            value_column=args.value_column, tiers=tiers,
            num_partitions=args.partitions, input_fingerprint=fp,
            resume=not args.no_resume, gap_fill=args.gap_fill, salt=args.salt,
        )
    rollup_sec = time.time() - t0

    metrics = {
        "input_files": len(files),
        "fingerprint": fp,
        "rollup_sec": round(rollup_sec, 3),
        "tiers": {},
    }
    points = 0
    for name, m in res.items():
        rows = int(m["row_count"].sum())
        points += rows
        metrics["tiers"][name] = {
            "partitions": int(len(m)),
            "rows": rows,
            "all_committed": bool((m["status"] == "committed").all()),
        }
    metrics["rolledup_points"] = points
    metrics["points_per_sec"] = round(points / rollup_sec, 1)

    if args.encode:
        import ray as _ray

        enc_conc = max(int(_ray.cluster_resources().get("CPU", 8)) // 2, 2)
        t1 = time.time()
        # ONE actor pool for every tier: read the tier dirs together (the
        # hive 'tier' column labels rows) and encode with tier="auto"
        names = [TIER_NAMES.get(f, f) for f in tiers]
        reads = [rd.read_parquet(os.path.join(args.out, f"tier={n}"))
                 for n in names]  # each re-adds its hive 'tier' column
        tds = reads[0].union(*reads[1:]) if len(reads) > 1 else reads[0]
        tds.map_batches(
            TierEncoder,
            fn_constructor_kwargs=dict(tier="auto"),
            batch_format="pandas",
            batch_size=None,  # whole blocks: the _many encoders amortize
            concurrency=enc_conc,  # < cpus: leave room for read tasks
        ).write_parquet(os.path.join(args.out, "chunks"),
                        partition_cols=["tier"])
        metrics["encode_sec"] = round(time.time() - t1, 3)

    if args.expire:
        from pytimetk_ray.pipelines.tiers import expire_tiers

        cutoffs = dict(kv.split("=", 1) for kv in args.expire.split(","))
        t2 = time.time()
        exp = expire_tiers(args.out, cutoffs)
        metrics["expire_sec"] = round(time.time() - t2, 3)
        metrics["expire"] = {
            tier: {"rows_kept": int(m["row_count"].sum()) if len(m) else 0}
            for tier, m in exp.items()
        }

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
