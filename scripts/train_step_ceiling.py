"""Ceiling arithmetic for the self-training step (VERDICT r4 #4).

Compiles the real train_step and reads XLA's own cost model
(`compiled.cost_analysis()`: flops + bytes accessed) to classify the step
as MXU-bound vs HBM-bound, and to turn the measured device ms/step
(scripts/profile_train_step.py) into an honest MFU with a stated ceiling —
the same treatment the ViT forward got (CLAUDE.md "Remaining TODO").

Runs on CPU by default (the HLO-level cost model is backend-independent
arithmetic; no tunnel needed):
  python -u scripts/train_step_ceiling.py --batch 96 [--measured-ms 38.4]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--backbone", default="dino_vits16")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="device ms/step from profile_train_step.py; when "
                         "given, prints measured MFU / HBM utilization")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "device"])
    a = ap.parse_args()

    import jax
    if a.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from deep_spectral_tpu.tasks import semantic_segmentation as SS

    cfg = SS.TrainConfig(backbone=a.backbone, num_classes=21,
                         batch_size=a.batch, precision=a.precision,
                         crop_size=a.crop, unfrozen_backbone_layers=1)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    rng = np.random.default_rng(0)
    ims = jnp.asarray(rng.standard_normal(
        (a.batch, a.crop, a.crop, 3)).astype(np.float32))
    labs = jnp.asarray(
        rng.integers(0, 21, (a.batch, a.crop, a.crop)), jnp.int32)
    key = jax.random.PRNGKey(0)

    step = jax.jit(lambda s, i, l, k: SS.train_step(s, i, l, k))
    compiled = step.lower(state, ims, labs, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    print(f"batch {a.batch} crop {a.crop} {a.precision} "
          f"(platform={a.platform})")
    print(f"XLA cost model: {flops/1e9:.1f} GFLOP/step, "
          f"{bytes_acc/1e9:.2f} GB accessed/step "
          f"({flops/a.batch/1e9:.2f} GFLOP/img)")

    t_mxu = flops / (V5E_BF16_TFLOPS * 1e12)
    t_hbm = bytes_acc / (V5E_HBM_GBS * 1e9)
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    print(f"v5e floors: MXU {t_mxu*1e3:.1f} ms (at {V5E_BF16_TFLOPS:.0f} "
          f"TFLOP/s peak), HBM {t_hbm*1e3:.1f} ms (at {V5E_HBM_GBS:.0f} "
          f"GB/s) -> cost-model {bound}-bound; "
          f"arithmetic intensity {flops/max(bytes_acc,1):.0f} FLOP/byte")
    if a.measured_ms:
        t = a.measured_ms / 1e3
        print(f"measured {a.measured_ms:.1f} ms/step = "
              f"{a.batch/t:.0f} img/s: "
              f"MFU {100*t_mxu/t:.1f}%, "
              f"HBM utilization {100*t_hbm/t:.1f}%, "
              f"combined-roofline attainment "
              f"{100*max(t_mxu, t_hbm)/t:.1f}%")


if __name__ == "__main__":
    main()
