"""Variance check on the two batched rows where the kernel loses to scan:
rpgd-neural and residual.  3 interleaved repeats of each pair in one
process — if the ordering flips between repeats the rows are inside the
pipelined-dispatch noise floor; if the kernel consistently loses it is a
real regression to bisect."""
import json
import time

from bench_scale import measure_batched_rpgd, measure_batched_residual


def main():
    import jax

    results = {"backend": jax.default_backend(), "unit": "ms/step"}
    t0 = time.time()
    for rep in range(3):
        ms_k = measure_batched_rpgd(B=128, K_per_slot=32, H=50,
                                    predictor_specification="neural:mlp-32-32")
        ms_s = measure_batched_rpgd(B=128, K_per_slot=32, H=50,
                                    force_scan=True,
                                    predictor_specification="neural:mlp-32-32")
        results[f"rpgd_neural_kernel_r{rep}"] = round(ms_k, 3)
        results[f"rpgd_neural_scan_r{rep}"] = round(ms_s, 3)
        print(f"rep{rep} rpgd-neural kernel {ms_k:.3f} | scan {ms_s:.3f}",
              flush=True)
        ms_k = measure_batched_residual(B=128, K_per_slot=512, H=35)
        ms_s = measure_batched_residual(B=128, K_per_slot=512, H=35,
                                        force_scan=True)
        results[f"residual_kernel_r{rep}"] = round(ms_k, 3)
        results[f"residual_scan_r{rep}"] = round(ms_s, 3)
        print(f"rep{rep} residual    kernel {ms_k:.3f} | scan {ms_s:.3f}",
              flush=True)
    results["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(results), flush=True)
    with open("/tmp/recheck2_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
