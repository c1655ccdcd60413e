"""Profile the headline bench workload (bench.py) and print an HLO-op
breakdown sorted by self time.

Usage (real TPU through the axon tunnel):
    timeout 1200 python scripts/profile_bench.py [--outdir /tmp/gcd_prof]

Writes an xplane trace via jax.profiler, converts it with xprof's
`hlo_stats` tool, and prints the top ops as TSV plus a per-category
rollup (convolution / dot / reduce / elementwise / ...). This is the
measurement loop behind the conv-frontier work (VERDICT.md round-1 #3):
~63% of the sampling step was XLA convs at round 1.
"""

from __future__ import annotations

import argparse
import csv
import glob
import io
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(outdir: str, what: str = "clip", time_iters: int = 0) -> None:
    import jax

    if what == "decode":
        import jax.numpy as jnp

        from bench import HL, T, WL, make_decoder

        decoder, dparams = make_decoder()
        # GCD_DECODE_CHUNK=n decodes in T/n chunks (the reference's
        # decoding_t path: temporal convs group per chunk) — a working-set
        # timing experiment.
        chunk = int(os.environ.get("GCD_DECODE_CHUNK", str(T)))

        @jax.jit
        def run(z):
            # The ragged tail (when chunk doesn't divide T) decodes with its
            # own timesteps — the temporal convs group per actual chunk size.
            outs = [decoder.apply(dparams, z[i:i + chunk],
                                  timesteps=min(chunk, T - i))
                    for i in range(0, T, chunk)]
            return jnp.concatenate(outs, axis=0)

        z = jax.random.normal(jax.random.PRNGKey(0), (T, HL, WL, 4),
                              dtype=jnp.bfloat16)
        fn = lambda i: run(z)
    else:
        from bench import build_sampler_fn

        # GCD_BENCH_BATCH=N profiles the batched-serving program (the
        # PERF_BATCH.json rows) instead of the driver's batch-1 workload.
        batch = int(os.environ.get("GCD_BENCH_BATCH", "1"))
        run_clip = build_sampler_fn(batch)
        key = jax.random.PRNGKey(0)
        fn = lambda i: run_clip(jax.random.fold_in(key, i))

    t0 = time.time()
    fn(0).block_until_ready()
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)
    if time_iters:
        times = []
        for i in range(time_iters):
            t0 = time.time()
            fn(i).block_until_ready()
            times.append(time.time() - t0)
        print(f"{what}: min {min(times)*1e3:.1f} ms, "
              f"median {sorted(times)[len(times)//2]*1e3:.1f} ms over "
              f"{time_iters} iters: {['%.0f' % (t*1e3) for t in times]}")
        return
    with jax.profiler.trace(outdir):
        for i in range(2):
            fn(i).block_until_ready()


def hlo_stats_tsv(outdir: str) -> str:
    from xprof.convert import raw_to_tool_data

    xspaces = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xspaces:
        raise FileNotFoundError(f"no xplane.pb under {outdir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xspaces[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


def parse_gviz(payload: str):
    """hlo_stats emits a gviz DataTable JSON: {"cols": [{id,label},...],
    "rows": [{"c": [{"v": ...}, ...]}]}. Return a list of dicts keyed by id."""
    import json

    d = json.loads(payload)
    ids = [c["id"] for c in d["cols"]]
    out = []
    for r in d.get("rows", []):
        vals = [(c or {}).get("v") for c in r["c"]]
        out.append(dict(zip(ids, vals)))
    return out


def summarize(payload: str, top: int = 40) -> None:
    rows = parse_gviz(payload)
    if not rows:
        print("no rows in hlo_stats output", file=sys.stderr)
        return

    def timeof(r):
        return float(r.get("total_self_time") or 0.0)

    total = sum(timeof(r) for r in rows)
    by_cat = defaultdict(float)
    for r in rows:
        by_cat[r.get("category") or "?"] += timeof(r)

    print(f"\n=== category rollup (total {total:.0f} us in trace window) ===")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t:>12.0f} us  {100*t/max(total,1e-9):5.1f}%  {cat}")

    print(f"\n=== top {top} ops by self time ===")
    rows.sort(key=timeof, reverse=True)
    for r in rows[:top]:
        fl = float(r.get("measured_flop_rate") or 0.0)
        bw = float(r.get("hbm_bw") or 0.0)
        occ = r.get("occurrences")
        expr = (r.get("hlo_op_expression") or "")[:200]
        print(f"{timeof(r):>10.0f} us {100*timeof(r)/max(total,1e-9):5.1f}% "
              f"x{occ:<5} {fl:>7.1f} GF/s {bw:>7.1f} GiB/s "
              f"[{r.get('category')}] {r.get('hlo_op_name')}\n    {expr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/gcd_prof")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reuse", action="store_true",
                    help="skip capture, summarize existing trace")
    ap.add_argument("--what", default="clip", choices=["clip", "decode"],
                    help="profile the full bench clip or the VAE decode leg")
    ap.add_argument("--time", type=int, default=0, metavar="N",
                    help="skip tracing; just time N iterations (for kernel-"
                         "flag A/Bs via GCD_* env vars)")
    args = ap.parse_args()
    if not args.reuse:
        os.makedirs(args.outdir, exist_ok=True)
        capture(args.outdir, args.what, args.time)
        if args.time:
            return
    tsv_path = os.path.join(args.outdir, "hlo_stats.tsv")
    tsv = hlo_stats_tsv(args.outdir)
    with open(tsv_path, "w") as fh:
        fh.write(tsv)
    print(f"wrote {tsv_path}", file=sys.stderr)
    summarize(tsv, args.top)


if __name__ == "__main__":
    main()
