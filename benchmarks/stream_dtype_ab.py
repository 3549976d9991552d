"""Hardware A/B for the dh / h stream-dtype levers (pallas_lstm.py).

Round-3 shipped the dxp/xp stream levers after measured wins
(BENCHMARKS.md "Gradient/xp stream dtype"); the dh-cotangent and
h-output stream levers were reasoned out but never measured on hardware
(the round-3 session hit a TPU outage), so their defaults are OFF
(ADVICE r3 — PROJ_FUSION discipline: no perf default flips without a
hardware A/B). This benchmark is that A/B:

  B16 float32 (reference config):
    base        — shipped defaults
    dh-forced   — dh cotangent stream forced bf16 (the CLAUDE.md open
                  lead: [T,B,H] bwd reads halve) even though compute is
                  f32; measures the lever ADVICE r3 flagged as
                  unmeasured. If it wins, it still needs a
                  loss-trajectory equivalence run before any default
                  flip (it rounds gradients the forward kept f32).
  B40 bfloat16 (best operating point):
    base / dh / dh+h — the gated levers as implemented.

Methodology per CLAUDE.md: every timed block chains value-dependent
steps and fences with a scalar host fetch; config blocks interleave
A/B/B/A per round so tunnel/host drift cannot masquerade as a lever
effect; each combo gets a FRESH device state per round (the jitted step
donates its input state).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_block", type=int, default=50)
    ap.add_argument("--n_rounds", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.ops import pallas_lstm
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    orig_dh_fn = pallas_lstm._dh_stream_dtype

    def set_combo(dh, hf, force_dh=False):
        # dh flag semantics predate the round-4 default flip
        # (DH_STREAM_FOLLOWS_RESIDUAL now defaults True); this A/B
        # still pins both sides explicitly so re-runs reproduce the
        # recorded comparison regardless of the shipped default.
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = dh
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = hf
        if force_dh:
            pallas_lstm._dh_stream_dtype = lambda c, r: jnp.bfloat16
        else:
            pallas_lstm._dh_stream_dtype = orig_dh_fn

    # (batch, dtype) -> list of (label, dh_flag, h_flag, force_dh)
    points = [
        (16, "float32", [
            ("base", False, False, False),
            ("dh-forced", False, False, True),
        ]),
        (40, "bfloat16", [
            ("base", False, False, False),
            ("dh", True, False, False),
            ("dh+h", True, True, False),
        ]),
    ]
    results = {}
    for batch_size, dt, combos in points:
        config = SpeechSplitConfig(batch_size=batch_size, compute_dtype=dt)
        module, state0 = create_train_state(config, jax.random.PRNGKey(0))
        # the step donates its input state: keep a host copy and
        # device_put a FRESH state per run
        state_host = jax.tree.map(np.asarray, state0)
        rng = np.random.RandomState(0)
        b, t = batch_size, config.max_len_pad
        batch = Batch(
            mel=rng.rand(b, t, config.dim_freq).astype(np.float32),
            spk_emb=np.eye(b, config.dim_spk_emb, dtype=np.float32),
            f0=rng.rand(b, t, 1).astype(np.float32),
            len_org=rng.randint(
                config.min_len_seq, config.max_len_seq + 1, b
            ).astype(np.int32),
        )
        batch = jax.tree.map(jax.device_put, batch)
        key = jax.random.PRNGKey(1)

        steps = {}
        for label, dh, hf, force in combos:
            set_combo(dh, hf, force)
            step = make_train_step(config, module)
            st = jax.device_put(state_host)
            t0 = time.perf_counter()
            for _ in range(3):
                st, loss = step(st, batch, key)
            warm = float(loss)
            log(f"B{batch_size} {dt} {label}: warm loss {warm:.6f} "
                f"(compile {time.perf_counter() - t0:.1f}s)")
            steps[label] = (step, dh, hf, force, warm)

        times = {c[0]: [] for c in combos}
        for r in range(args.n_rounds):
            order = [c[0] for c in combos]
            if r % 2:
                order = order[::-1]
            for label in order:
                step, dh, hf, force, _ = steps[label]
                set_combo(dh, hf, force)
                st = jax.device_put(state_host)
                st, loss = step(st, batch, key)
                float(loss)  # fence before the timed block
                start = time.perf_counter()
                for _ in range(args.n_block):
                    st, loss = step(st, batch, key)
                float(loss)  # fence
                times[label].append(
                    (time.perf_counter() - start) / args.n_block * 1e3
                )
        set_combo(False, False, False)
        results[f"B{batch_size}_{dt}"] = {
            label: {
                "min_ms": round(min(ts), 3),
                "all": [round(x, 3) for x in ts],
                "warm_loss": steps[label][4],
            }
            for label, ts in times.items()
        }
        log(json.dumps(results[f"B{batch_size}_{dt}"]))
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
