"""Round-5 hardware trace of the headline sequence (VERDICT r4 next #7).

Captures a jax.profiler trace of ONE 28-step 7-frame SDXL 1024px
denoise_sequence run (the bench.py headline program) and aggregates device
op durations by op class, to answer: does the non-attention residual
(convs, GEGLU, scheduler glue) hold >25% of step time — i.e. is the kernel
ceiling claim certified, or does round-6 perf work have a target?

Usage (on the TPU):  python tools/trace_r5.py [--steps N] [--out DIR]

Parses the perfetto trace.json.gz the profiler writes (no
tensorboard_plugin_profile dependency); falls back to listing the trace
dir if the JSON export is absent. Appends nothing — prints the table;
PERF.md is updated by hand from the output.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import time

import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aid_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_run():
    """The EXACT headline program the bench times, via bench.build_headline
    — a drifting local copy here would profile a different program than the
    one BENCH_r*.json reports and invalidate the PERF.md attribution
    (round-5 review finding: the old copy hardcoded the pooled-embed width
    the bench derives from the config)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    hl = bench.build_headline(num_steps=ARGS.steps)

    def run():
        # denoise_sequence donates latents: rebuild per call
        return hl.force(hl.run(hl.sample * hl.state.init_noise_sigma))

    return run


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith(("jit_", "while", "body", "cond", "run", "program", "module")):
        # wrapper events: after self-time accounting, what remains here is
        # the gap BETWEEN ops — scheduling/sequencing bubbles, not compute
        return "program/loop gaps (scheduling)"
    if "custom" in n or "flash" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas-kernel (interpolated flash attention)"
    if re.search(r"conv(?!ert)", n):
        # "conv" NOT followed by "ert": conv3x3 / convolution_* match, but
        # dtype-cast ops ("convert", incl. convert_reduce_fusion = the fp32
        # GroupNorm stats passes) must NOT be attributed to convolutions —
        # a plain "conv" substring test misclassified 16.1% of the round-5
        # trace (convolution_convert_fusion still counts as a conv: its
        # first "conv" is the convolution)
        return "convolution"
    if "convert" in n:
        return "fusion (elementwise/GN/GEGLU glue)"
    if "dot" in n or "gemm" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "all-gather" in n or "all-reduce" in n or "collective" in n or "copy" in n:
        return "copy/collective"
    if "fusion" in n or "loop" in n:
        return "fusion (elementwise/GN/GEGLU glue)"
    if "dynamic" in n or "slice" in n or "gather" in n or "scatter" in n or "concatenate" in n:
        return "data movement"
    return "other"


def base_name(name: str) -> str:
    """Strip XLA's uniquifying suffixes: 'conv3x3_same.241' -> 'conv3x3_same',
    'jit_denoise_sequence(304...)' -> 'jit_denoise_sequence'."""
    name = name.split("(")[0]
    parts = name.rsplit(".", 1)
    if len(parts) == 2 and parts[1].isdigit():
        return parts[0]
    return name


def self_times(events):
    """(name, self_dur_us) per complete event, per (pid, tid) track.

    Device tracks nest wrapper events (jit_<fn>, while bodies) around the
    leaf ops; naive summing double-counts every nesting level (the round-5
    first cut counted the whole 21.7 s program AND its two while loops AND
    the leaves = 65 s for a 21.7 s run). Standard self-time: sort by
    (ts asc, dur desc), maintain an open-interval stack, subtract each
    child's duration from its parent."""
    by_track = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("dur") is not None:
            by_track[(e.get("pid"), e.get("tid"))].append(
                (float(e["ts"]), float(e["dur"]), e.get("name", "?")))
    out = []
    for track in by_track.values():
        track.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # [ts, end, name, child_total]
        for ts, dur, nm in track:
            while stack and ts >= stack[-1][1] - 1e-9:
                fin = stack.pop()
                out.append((fin[2], fin[1] - fin[0] - fin[3]))
            if stack:
                stack[-1][3] += dur
            stack.append([ts, ts + dur, nm, 0.0])
        while stack:
            fin = stack.pop()
            out.append((fin[2], fin[1] - fin[0] - fin[3]))
    return out


def aggregate(trace_dir: str):
    files = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
                   key=os.path.getmtime)
    if not files:
        print("no trace.json.gz found under", trace_dir)
        for f in glob.glob(os.path.join(trace_dir, "plugins/profile/*/*")):
            print("  present:", f)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" (host python threads excluded);
    # within the device pid, drop the "XLA Modules" thread — its events are
    # whole-program wrappers whose children live on the "XLA Ops" thread, so
    # cross-track nesting would double-count the entire run
    device_pids = set()
    pid_names = {}
    module_tracks = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
            if "tpu" in e["args"].get("name", "").lower():
                device_pids.add(e["pid"])
        elif e.get("name") == "thread_name" and "modules" in e["args"].get("name", "").lower():
            module_tracks.add((e["pid"], e.get("tid")))
    print("process tracks:", sorted(pid_names.values()))
    dev_events = [e for e in events if e.get("pid") in device_pids
                  and (e.get("pid"), e.get("tid")) not in module_tracks]
    by_name = collections.Counter()
    by_class = collections.Counter()
    total = 0.0
    for nm, self_us in self_times(dev_events):
        if self_us <= 0:
            continue
        bn = base_name(nm)
        by_name[bn] += self_us
        by_class[classify(bn)] += self_us
        total += self_us
    if not by_name:
        print("no device events captured (tunnel may not support device tracing)")
        return
    print(f"\ntotal device self-time: {total / 1e6:.3f} s")
    print("\n== top-20 op groups (self-time, uniquifier suffixes merged) ==")
    for nm, d in by_name.most_common(20):
        print(f"  {d / 1e6:8.3f} s  {100 * d / total:5.1f}%  {nm}")
    print("\n== op classes (name-based; see hlo_category table for the"
          " authoritative attribution) ==")
    for cl, d in by_class.most_common():
        print(f"  {d / 1e6:8.3f} s  {100 * d / total:5.1f}%  {cl}")
    aggregate_by_category(events)


def aggregate_by_category(events):
    """Authoritative per-class roofline table from the profiler's own HLO
    metadata (leaf events only — every leaf op carries ``hlo_category``;
    wrappers carry none or 'while', so no self-time subtraction is needed).

    Name-based classification is MISLEADING on TPU: XLA names a fusion
    after its OUTPUT/epilogue ops, so a convolution fusion whose epilogue
    computes GroupNorm statistics is named ``convert_reduce_fusion`` — the
    round-5 name-based table attributed 6.7 s of convolution-category time
    (3.4 s of it under convert_reduce_*) to "elementwise/GN fusions".
    ``hlo_category`` classifies by the fusion's ROOT cost instead, and the
    per-event ``bytes_accessed`` / ``model_flops`` give achieved GB/s and
    TF/s per class, i.e. the distance to each class's own roofline
    (v5e: 197 TF/s bf16 MXU peak, 819 GB/s HBM)."""
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None or cat == "while":
            continue
        agg[cat][0] += float(e.get("dur", 0))
        agg[cat][1] += float(a.get("bytes_accessed", 0))
        agg[cat][2] += float(a.get("model_flops", 0) or 0)
    if not agg:
        print("\n(no hlo_category metadata in this trace)")
        return
    tot = sum(v[0] for v in agg.values())
    totf = sum(v[2] for v in agg.values())
    print(f"\n== hlo_category roofline table (leaf total {tot / 1e6:.3f} s,"
          f" {totf / 1e12:.0f} TFLOP costed by XLA) ==")
    print(f"  {'category':26s} {'dur_s':>7s} {'share':>6s} {'TB':>6s}"
          f" {'GB/s':>5s} {'TFLOP':>7s} {'TF/s':>6s}")
    for cat, (d, b, f) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cat:26s} {d / 1e6:7.3f} {100 * d / tot:5.1f}%"
              f" {b / 1e12:6.2f} {b / 1e3 / d if d else 0:5.0f}"
              f" {f / 1e12:7.1f} {f / d * 1e-6 if d else 0:6.1f}")
    print("  (custom-call = Pallas kernels; XLA cannot cost their flops —"
          " attribute the bench.py jaxpr-walker total minus the costed"
          " TFLOP above to them)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--out", default="/tmp/aid_tpu_trace_r5")
    p.add_argument("--parse-only", action="store_true",
                   help="skip execution; aggregate an existing trace dir")
    ARGS = p.parse_args()
    if not ARGS.parse_only:
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from aid_tpu.utils.tpulock import tpu_lock

        # serialize tunnel access (two concurrent axon dialers deadlock
        # the chip claim — round-5 finding)
        with tpu_lock():
            run = build_run()
            t0 = time.perf_counter()
            run()  # compile + warm (persistent cache)
            print(f"warmup {time.perf_counter() - t0:.1f}s; tracing one run...")
            jax.profiler.start_trace(ARGS.out)
            t0 = time.perf_counter()
            run()
            jax.profiler.stop_trace()
            print(f"traced run {time.perf_counter() - t0:.1f}s -> {ARGS.out}")
    aggregate(ARGS.out)
