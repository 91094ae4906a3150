"""Focused re-measurement of the five contested batched-kernel rows.

Round-4's canonical BENCH_SCALE refresh (63a57d2) showed five batched
kernel rows LOSING to their vmap-scan twins, contradicting the prior
coherent run and docs/KERNELS.md.  This script re-runs exactly those
pairs (kernel vs scan, same process, back-to-back) on a quiet machine
so the contradiction can be adjudicated: contaminated run vs a real
regression from the round-4 batched value-terminal plumbing.

Run detached:  nohup python -u bench_batched_recheck.py > /tmp/recheck.log &
"""
import json
import time

from bench_scale import (
    measure_batched_serving,
    measure_batched_rpgd,
    measure_batched_gp,
    measure_batched_residual,
    measure_batched_fused_cem,
)


def main():
    import jax

    results = {"backend": jax.default_backend(), "unit": "ms/step"}
    t0 = time.time()

    ms_k = measure_batched_serving(B=128, K_per_slot=512)
    ms_s = measure_batched_serving(B=128, K_per_slot=512, force_scan=True)
    results["batched_serving_B128_K512"] = round(ms_k, 3)
    results["batched_serving_B128_K512_vmap_scan"] = round(ms_s, 3)
    print(f"serving   kernel {ms_k:.3f} | scan {ms_s:.3f} | {ms_s/ms_k:.2f}x",
          flush=True)

    ms_k = measure_batched_rpgd(B=128, K_per_slot=32, H=50,
                                predictor_specification="neural:mlp-32-32")
    ms_s = measure_batched_rpgd(B=128, K_per_slot=32, H=50, force_scan=True,
                                predictor_specification="neural:mlp-32-32")
    results["batched_rpgd_neural_B128_K32_H50"] = round(ms_k, 3)
    results["batched_rpgd_neural_B128_K32_H50_vmap_scan"] = round(ms_s, 3)
    print(f"rpgd-neur kernel {ms_k:.3f} | scan {ms_s:.3f} | {ms_s/ms_k:.2f}x",
          flush=True)

    ms_k = measure_batched_gp(B=128, K_per_slot=512, H=35)
    ms_s = measure_batched_gp(B=128, K_per_slot=512, H=35, force_scan=True)
    results["batched_gp_sgp128_B128_K512_H35"] = round(ms_k, 3)
    results["batched_gp_sgp128_B128_K512_H35_vmap_scan"] = round(ms_s, 3)
    print(f"gp        kernel {ms_k:.3f} | scan {ms_s:.3f} | {ms_s/ms_k:.2f}x",
          flush=True)

    ms_k = measure_batched_residual(B=128, K_per_slot=512, H=35)
    ms_s = measure_batched_residual(B=128, K_per_slot=512, H=35,
                                    force_scan=True)
    results["batched_residual_B128_K512_H35"] = round(ms_k, 3)
    results["batched_residual_B128_K512_H35_vmap_scan"] = round(ms_s, 3)
    print(f"residual  kernel {ms_k:.3f} | scan {ms_s:.3f} | {ms_s/ms_k:.2f}x",
          flush=True)

    ms_k = measure_batched_fused_cem(B=128, K_per_slot=512, H=35)
    ms_s = measure_batched_fused_cem(B=128, K_per_slot=512, H=35,
                                     fully_fused=False)
    results["batched_fused_cem_B128_K512_H35"] = round(ms_k, 3)
    results["batched_fused_cem_B128_K512_H35_vmap_scan"] = round(ms_s, 3)
    print(f"fused-cem kernel {ms_k:.3f} | scan {ms_s:.3f} | {ms_s/ms_k:.2f}x",
          flush=True)

    results["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(results), flush=True)
    with open("/tmp/recheck_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
