"""GAN subsystem tests: generator/discriminator/VAE shapes, DCGAN step
schedule (G every 3rd, label flip every 5th), EMA, LSRO loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reid_tpu.gan import (
    VAE,
    CategoricalConditionalBN,
    Discriminator,
    Generator,
    create_gan_state,
    ema_update,
    generate_images,
    lsro_loss,
    make_dcgan_steps,
)


def test_generator_shapes_both_variants():
    for spectral in (True, False):
        g = Generator(nz=16, ngf=8, spectral=spectral)
        z = jnp.zeros((2, 16))
        v = g.init(jax.random.PRNGKey(0), z, train=True)
        out, _ = g.apply(v, z, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 128, 64, 3), spectral
        assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_discriminator_heads():
    x = jnp.zeros((2, 128, 64, 3))
    d = Discriminator(ndf=8, spectral=True)
    v = d.init(jax.random.PRNGKey(0), x, train=True)
    s, _ = d.apply(v, x, train=True, mutable=["batch_stats"])
    assert s.shape == (2, 1) and 0 <= float(s[0, 0]) <= 1

    dw = Discriminator(ndf=8, spectral=False, wasserstein=True)
    vw = dw.init(jax.random.PRNGKey(0), x, train=True)
    sw, _ = dw.apply(vw, x, train=True, mutable=["batch_stats"])
    assert sw.shape == (2, 1)

    dv = Discriminator(ndf=8, spectral=False, vae=True)
    vv = dv.init(jax.random.PRNGKey(0), x, train=True)
    (sv, feats), _ = dv.apply(vv, x, train=True, mutable=["batch_stats"])
    assert sv.shape == (2, 1) and feats.shape[0] == 2


def test_vae_roundtrip():
    m = VAE(zdim=16)
    x = jnp.zeros((2, 128, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1),
               train=True)
    (mean, var, recon), _ = m.apply(v, x, jax.random.PRNGKey(2), train=True,
                                    mutable=["batch_stats"])
    assert mean.shape == (2, 16) and var.shape == (2, 16)
    assert recon.shape == (2, 128, 64, 3)
    # decode-only path
    z = jnp.zeros((3, 16))
    imgs = m.apply(v, z, train=False, method=VAE.decode)
    assert imgs.shape == (3, 128, 64, 3)


def test_conditional_bn():
    m = CategoricalConditionalBN(num_classes=4, features=8)
    x = jnp.ones((2, 4, 4, 8))
    y = jnp.asarray([0, 3])
    v = m.init(jax.random.PRNGKey(0), x, y, train=True)
    out, _ = m.apply(v, x, y, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape


def test_dcgan_training_schedule(rng):
    gen = Generator(nz=8, ngf=4, spectral=False)
    disc = Discriminator(ndf=4, spectral=False)
    state, g_tx, d_tx = create_gan_state(jax.random.PRNGKey(0), gen, disc,
                                         nz=8)
    step = make_dcgan_steps(gen, disc, g_tx, d_tx, nz=8)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 128, 64, 3)), jnp.float32)
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    g_losses = []
    for i in range(3):
        state, m = step(state, real, jax.random.PRNGKey(i))
        g_losses.append(float(m["g_loss"]))
        assert np.isfinite(float(m["d_loss"]))
    # G updates only on the 3rd step (step index 2)
    assert g_losses[0] == 0.0 and g_losses[1] == 0.0 and g_losses[2] != 0.0
    g1 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # sampling with EMA works
    imgs = generate_images(gen, state, jax.random.PRNGKey(9), n=5, nz=8,
                           batch=4)
    assert imgs.shape == (5, 128, 64, 3)


def test_ema_update():
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_lsro_loss():
    logits = jnp.asarray([[10.0, 0.0], [10.0, 0.0]])
    labels = jnp.asarray([0, 0])
    # real sample: low CE; generated: pulled to uniform (higher loss)
    real = float(lsro_loss(logits, labels, jnp.asarray([0, 0])))
    mixed = float(lsro_loss(logits, labels, jnp.asarray([0, 1])))
    assert mixed > real


# ---------------------------------------------------------------------------
# drivers (ref synthetic_main.py:279-397, train_baseline.py:214-303)
# ---------------------------------------------------------------------------

def _toy_images(rng, n=16):
    """Two visually distinct appearance groups: dark-red vs bright-blue."""
    imgs = np.zeros((n, 128, 64, 3), np.float32)
    imgs[: n // 2, :, :, 0] = 0.8     # group A: red
    imgs[n // 2:, :, :, 2] = -0.8     # group B: blue
    imgs += rng.normal(0, 0.05, imgs.shape).astype(np.float32)
    return np.clip(imgs, -1, 1)


def test_get_groups_separates_appearance(rng):
    from reid_tpu.gan import get_groups

    imgs = _toy_images(rng, n=16)
    g = get_groups(imgs, k=2)
    assert g.shape == (16,)
    # each color block lands in one cluster, the two blocks differ
    assert len(set(g[:8])) == 1 and len(set(g[8:])) == 1
    assert g[0] != g[8]


def test_train_gan_groups_per_group_checkpoints(rng, tmp_path):
    from reid_tpu.gan import (generate_group_images, get_groups,
                              train_gan_groups)

    imgs = _toy_images(rng, n=24)
    groups = get_groups(imgs, k=2)
    logs = []
    final, per_group = train_gan_groups(
        imgs, groups, k=2, epochs=1, batch_size=4, nz=8, ngf=4, ndf=4,
        checkpoint_dir=str(tmp_path), log_fn=logs.append)
    assert len(per_group) == 2
    # one checkpoint per group (ref Generate_model_trained_group{g}.pt)
    assert (tmp_path / "gan_group0").exists()
    assert (tmp_path / "gan_group1").exists()
    # per-group EMA shadows diverge (fresh EMA per group, trained on
    # different data): 3 batches/group -> at least one G update each
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(per_group[0].ema_params),
                             jax.tree_util.tree_leaves(per_group[1].ema_params))]
    assert any(diffs)
    imgs_out = generate_group_images(per_group, 2, nz=8, ngf=4)
    assert imgs_out.shape == (4, 128, 64, 3)
    assert any("group 1" in m for m in logs)


def test_train_vaegan_driver(rng):
    from reid_tpu.gan import sample_vaegan, train_vaegan

    imgs = _toy_images(rng, n=8)
    vae, state = train_vaegan(imgs, epochs=1, batch_size=4, zdim=8,
                              wasserstein=False, log_fn=lambda *_: None)
    out = sample_vaegan(vae, state, 3, zdim=8, batch=4)
    assert out.shape == (3, 128, 64, 3)
    assert np.isfinite(out).all()


def test_train_lsro_baseline(rng):
    from reid_tpu.gan import train_lsro_baseline

    real = _toy_images(rng, n=8)
    labels = np.asarray([0] * 4 + [1] * 4)
    gen = rng.uniform(-1, 1, (4, 128, 64, 3)).astype(np.float32)
    state, hist = train_lsro_baseline(
        real, labels, gen, num_classes=2, epochs=2, batch_size=4,
        lr=1e-2, log_fn=lambda *_: None)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    # accuracy counts real samples only -> within [0, 1]
    assert 0.0 <= hist[-1]["acc"] <= 1.0
    assert "params" in state and "batch_stats" in state


def test_make_resnet_embed_fn_grouping(tmp_path, rng):
    """Reference-equivalent grouping features: a torchvision-layout resnet50
    state_dict converts into the grouping embedder (ref kmeans_.py:16-34
    ImageNet trunk role)."""
    torch = pytest.importorskip("torch")

    from reid_tpu.gan import get_groups, make_resnet_embed_fn

    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = torch.randn((o, i, k, k), generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[name + ".bias"] = torch.randn(c, generator=g) * 0.05
        sd[name + ".running_mean"] = torch.randn(c, generator=g) * 0.05
        sd[name + ".running_var"] = torch.rand(c, generator=g) * 0.5 + 0.75

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, (p, nb) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3)), 1):
        for b in range(nb):
            t = f"layer{li}.{b}"
            conv(f"{t}.conv1.weight", p, cin, 1)
            bn(f"{t}.bn1", p)
            conv(f"{t}.conv2.weight", p, p, 3)
            bn(f"{t}.bn2", p)
            conv(f"{t}.conv3.weight", p * 4, p, 1)
            bn(f"{t}.bn3", p * 4)
            if b == 0:
                conv(f"{t}.downsample.0.weight", p * 4, cin, 1)
                bn(f"{t}.downsample.1", p * 4)
            cin = p * 4
    path = tmp_path / "r50.pt"
    torch.save(sd, str(path))

    embed_fn = make_resnet_embed_fn(str(path))
    import jax.numpy as jnp
    imgs = jnp.asarray(rng.uniform(-1, 1, (4, 128, 64, 3)), jnp.float32)
    feats = np.asarray(embed_fn(imgs))
    assert feats.shape == (4, 2048)
    assert np.isfinite(feats).all()

    # grouping with the real embedder separates bright vs dark images
    bright = rng.uniform(0.5, 1, (8, 128, 64, 3)).astype(np.float32)
    dark = rng.uniform(-1, -0.5, (8, 128, 64, 3)).astype(np.float32)
    groups = get_groups(np.concatenate([bright, dark]), 2,
                        embed_fn=embed_fn)
    assert len(set(groups[:8])) == 1 and len(set(groups[8:])) == 1
    assert groups[0] != groups[8]
