"""Split the damped-streaming global pass into compile vs steady-state.

chip_logs/damped.log measured the 100 s damped encode at 1.6x realtime
with the global pass on — but that one number folds the per-process
compile tax (shard cores at NEW 100 s bucket shapes + the global core)
into the denominator. This script runs the identical encode TWICE in one
process, collecting the per-phase table each time: run 1 pays every
compile, run 2 is the steady-state device+transport cost the ≥100x
target actually budgets (the compile tax is separately killed by
FWAV_EXEC_CACHE / `fwavc warmup`, chip_logs/aot.log).

Usage: python scripts/profile_damped_chip.py [--seconds 100] [--reps 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=100.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bench import make_signal
    from fwav_tpu import compute_snr, decompress_audio
    from fwav_tpu.models.stream import (
        compress_audio_streaming,
        domain_block_iter,
    )
    from fwav_tpu.utils.trace import collect_phases

    sr = 44100
    sig = make_signal(args.seconds, sr)
    last = None
    for rep in range(args.reps):
        with collect_phases() as phases:
            t0 = time.perf_counter()
            rec, _, n_ranges, rs, tile, step, _, olen = (
                compress_audio_streaming(
                    sig, sr, 2, objective="damped",
                )
            )
            dt = time.perf_counter() - t0
        print(json.dumps({
            "rep": rep,
            "encode_s": round(dt, 3),
            "x_realtime": round(args.seconds / dt, 1),
            "phases": {k: round(v, 3) for k, v in sorted(phases.items())},
        }), flush=True)
        last = (rec, n_ranges, rs, tile, step, olen)
    rec, n_ranges, rs, tile, step, olen = last
    bank = np.concatenate(list(domain_block_iter(sig, tile, rs, step)))
    out = decompress_audio(
        rec, bank, n_ranges, rs, original_len=olen, s_damping=0.25
    )
    print(json.dumps({"snr_db": round(float(compute_snr(sig, out)), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
