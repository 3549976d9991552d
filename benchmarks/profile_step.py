"""Device profile of the train step: capture a jax.profiler trace and
print a per-step op-class breakdown.

Reproduces the BENCHMARKS.md "Device profile" tables: runs the full
fused train step N times under ``jax.profiler`` and aggregates the
device-lane events from the Chrome-trace dump by op class (Pallas
kernels, XLA fusions, HBM<->VMEM copies/slices, convolutions, ...).

Usage::

    python -m benchmarks.profile_step [--steps 20] [--batch 16]
           [--dtype float32] [--fusion off|auto] [--trace_dir DIR]
           [--top 25]

The trace dir is kept (default under /tmp) so the raw trace can be
inspected with TensorBoard's profile plugin elsewhere.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# op-name -> class rules, checked in order (first match wins)
_CLASSES = [
    ("pallas", re.compile(r"custom-call|pallas|tpu_custom_call", re.I)),
    ("conv", re.compile(r"^%?(convolution|conv)", re.I)),
    ("copy/slice", re.compile(r"copy|slice|bitcast|transpose", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
    ("sort/topk", re.compile(r"sort|top-k|topk", re.I)),
    ("while/cond", re.compile(r"while|conditional", re.I)),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|send|recv", re.I)),
]


def classify(name: str) -> str:
    for cls, pat in _CLASSES:
        if pat.search(name):
            return cls
    return "other"


def parse_trace(trace_dir: str, steps: int, top: int) -> None:
    # newest trace, not largest: each capture writes a fresh timestamped
    # subdir under the (possibly reused) trace dir, and picking by size
    # can silently select a stale run with a different step count
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    path = paths[-1]
    log(f"parsing {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device lanes: processes whose name mentions the accelerator; fall
    # back to every non-python lane if none match (CPU-backend traces)
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                "name", ""
            )
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if re.search(r"TPU|device|/device:|XLA", name, re.I)
        and not re.search(r"python|host", name, re.I)
    }
    if not device_pids:
        log("WARNING: no device-named lanes; summing ALL lanes "
            "(host time included)")
        device_pids = set(pid_names)
    # within a device pid, restrict to the op-level thread when the
    # profiler provides named threads: module/step-level lanes span the
    # ops they contain and would double-count every duration
    op_tids = {
        key
        for key, name in tid_names.items()
        if key[0] in device_pids and re.search(r"ops", name, re.I)
    }
    log(f"device lanes: {sorted(pid_names[p] for p in device_pids)}; "
        f"op threads: {sorted(tid_names[k] for k in op_tids) or 'all'}")

    by_class = collections.Counter()
    n_by_class = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        if op_tids and (ev["pid"], ev.get("tid")) not in op_tids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        cls = classify(name)
        by_class[cls] += dur
        n_by_class[cls] += 1
        by_op[name] += dur
        total += dur

    print(f"\ntotal device time: {total / steps / 1e3:.3f} ms/step "
          f"over {steps} steps\n")
    print(f"{'class':<16}{'ms/step':>10}{'ops/step':>10}{'share':>8}")
    for cls, dur in by_class.most_common():
        print(
            f"{cls:<16}{dur / steps / 1e3:>10.3f}"
            f"{n_by_class[cls] / steps:>10.1f}"
            f"{dur / total:>8.1%}"
        )
    print(f"\ntop {top} ops (ms/step):")
    for name, dur in by_op.most_common(top):
        print(f"  {dur / steps / 1e3:>8.3f}  {name[:100]}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--fusion", default="off",
                    help="pallas_lstm.PROJ_FUSION pin (off|auto); "
                    "default matches the production default so a bare "
                    "run profiles what training runs")
    ap.add_argument("--trace_dir", default="/tmp/profile_step")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse_only", default="",
                    help="skip capture; parse this trace dir")
    args = ap.parse_args(argv)

    if args.parse_only:
        parse_trace(args.parse_only, args.steps, args.top)
        return

    from speechsplit_tpu.utils import enable_compile_cache, profile_trace

    enable_compile_cache()

    import jax
    import numpy as np

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.ops import pallas_lstm
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    pallas_lstm.PROJ_FUSION = args.fusion
    config = SpeechSplitConfig(
        batch_size=args.batch, compute_dtype=args.dtype
    )
    rng = np.random.RandomState(0)
    b, t = args.batch, config.max_len_pad
    batch = Batch(
        mel=rng.rand(b, t, config.dim_freq).astype(np.float32),
        spk_emb=np.eye(b, config.dim_spk_emb, dtype=np.float32),
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=rng.randint(
            config.min_len_seq, config.max_len_seq + 1, b
        ).astype(np.int32),
    )
    batch = jax.tree.map(jax.device_put, batch)
    module, state = create_train_state(config, jax.random.PRNGKey(0))
    step = make_train_step(config, module)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, loss = step(state, batch, key)
    float(loss)  # fence: compiled and warm
    log(f"warm (batch {args.batch} {args.dtype} fusion={args.fusion}); "
        f"tracing {args.steps} steps -> {args.trace_dir}")

    with profile_trace(args.trace_dir):
        for _ in range(args.steps):
            state, loss = step(state, batch, key)
        float(loss)  # fence inside the trace window

    parse_trace(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
