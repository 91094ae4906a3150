import json
from bench_scale import measure_batched_rpgd
res = {}
for Kps, B in ((128, 128), (512, 32)):
    k = measure_batched_rpgd(B=B, K_per_slot=Kps, H=50,
                             predictor_specification="neural:mlp-32-32")
    s = measure_batched_rpgd(B=B, K_per_slot=Kps, H=50, force_scan=True,
                             predictor_specification="neural:mlp-32-32")
    res[f"B{B}_K{Kps}_kernel"] = round(k, 3)
    res[f"B{B}_K{Kps}_scan"] = round(s, 3)
    print(f"B={B} K={Kps}: kernel {k:.3f} | scan {s:.3f} | {s/k:.2f}x", flush=True)
print(json.dumps(res), flush=True)
