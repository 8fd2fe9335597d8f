"""Demo: deployment-format roundtrip — train state -> StableHLO artifact ->
checkpoint-free serving (no dataset needed). The role of the reference's
ONNX export + onnxruntime consumption (`reid/train_prepare.py:14-47`,
`image_reid_inference.py:239`).

Exports the WHOLE serving step (ImageNet normalize + dual-view TTA flip +
L2-normalized [feat || logits] merge) as one StableHLO module with a
dynamic batch axis, reloads it, and checks the artifact's embeddings match
the in-process path on three different batch sizes.

Run: python examples/demo_serving.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from reid_tpu.config import Config, ModelConfig, TrainConfig
    from reid_tpu.eval.serving import (export_reid_artifact, load_serving_fn,
                                       make_embed_fn)
    from reid_tpu.models import build_model
    from reid_tpu.train import create_train_state

    h, w, n_ids = 256, 128, 32
    cfg = Config(model=ModelConfig(num_classes=n_ids),
                 train=TrainConfig(batch_size=8))
    model = build_model("seres18", num_classes=n_ids)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg, 1,
                               input_shape=(2, h, w, 3))

    path = os.path.join(tempfile.mkdtemp(), "reid.stablehlo")
    data = export_reid_artifact(state, path, height=h, width=w)
    print(f"exported serving artifact: {len(data) / 1e6:.1f} MB -> {path}")

    embed = load_serving_fn(path)        # needs no model code / params
    reference = make_embed_fn(state)
    rng = np.random.default_rng(0)
    for batch in (1, 4, 16):             # dynamic batch axis
        x = jnp.asarray(rng.integers(0, 255, (batch, h, w, 3)), jnp.float32)
        out = np.asarray(embed(x))
        ref = np.asarray(reference(x))
        err = float(np.abs(out - ref).max())
        norms = np.linalg.norm(out, axis=1)
        print(f"batch {batch:2d}: emb {out.shape}, max|artifact-inproc| "
              f"{err:.2e}, row norms {norms.min():.4f}..{norms.max():.4f}")
        assert err < 5e-3   # fp32 reassociation across the export boundary
    print("serving artifact matches the in-process embed path")


if __name__ == "__main__":
    main()
