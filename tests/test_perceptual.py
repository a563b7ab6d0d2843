"""Parity tests for models/perceptual.py: LPIPS(alex) and ViT patch
descriptors vs independent torch fixture implementations (torch-cpu is
available; pretrained weights are not, so fixtures use random weights in
the real architectures' shapes — scaled-down channel counts where the
math is shape-generic)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fisher_nerf_customized_tpu.models.perceptual import (  # noqa: E402
    ViTPatchExtractor, load_torch_lpips, load_torch_vit, lpips_alex,
    vit_patch_descriptors, _SHIFT, _SCALE)


def _tiny_alex_params(rng):
    # real alexnet kernel/stride/pad geometry, reduced channels
    chans = [(3, 4, 11), (4, 6, 5), (6, 8, 3), (8, 8, 3), (8, 8, 3)]
    idxs = (0, 3, 6, 8, 10)
    p = {}
    for (cin, cout, k), i in zip(chans, idxs):
        p[f"features.{i}.weight"] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32) * 0.2
        p[f"features.{i}.bias"] = rng.normal(size=(cout,)).astype(np.float32)
    for li, (_, cout, _) in enumerate(chans):
        p[f"lin{li}.model.1.weight"] = np.abs(rng.normal(
            size=(1, cout, 1, 1))).astype(np.float32)
    return p


def _torch_lpips(p, im1, im2):
    """Independent torch replication of lpips.LPIPS(net='alex').forward."""
    def prep(im):
        x = torch.tensor(im).permute(2, 0, 1)[None] * 2 - 1
        sh = torch.tensor(_SHIFT)[None, :, None, None]
        sc = torch.tensor(_SCALE)[None, :, None, None]
        return (x - sh) / sc

    def feats(x):
        outs = []
        geo = ((0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1))
        for i, s, pad in geo:
            if i in (3, 6):
                x = F.max_pool2d(x, 3, 2)
            x = F.relu(F.conv2d(x, torch.tensor(p[f"features.{i}.weight"]),
                                torch.tensor(p[f"features.{i}.bias"]),
                                stride=s, padding=pad))
            outs.append(x)
        return outs

    total = 0.0
    for li, (a, b) in enumerate(zip(feats(prep(im1)), feats(prep(im2)))):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.tensor(p[f"lin{li}.model.1.weight"])
        total = total + F.conv2d(d, w).mean()
    return float(total)


def test_lpips_alex_matches_torch():
    rng = np.random.default_rng(0)
    p = _tiny_alex_params(rng)
    im1 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    im2 = np.clip(im1 + rng.normal(size=im1.shape).astype(np.float32) * 0.1,
                  0, 1)
    got = float(lpips_alex(p, im1, im2))
    want = _torch_lpips(p, im1, im2)
    assert got == pytest.approx(want, rel=1e-4)
    assert float(lpips_alex(p, im1, im1)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_loader_remaps_slice_names(tmp_path):
    rng = np.random.default_rng(1)
    p = _tiny_alex_params(rng)
    # full lpips.LPIPS state_dict naming: net.sliceK.<features idx>.*
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    sd = {}
    for k, v in p.items():
        if k.startswith("features."):
            i = int(k.split(".")[1])
            sd[f"net.slice{slice_of[i]}.{i}.{k.split('.')[2]}"] = \
                torch.tensor(v)
        else:
            sd[k] = torch.tensor(v)
    sd["scaling_layer.shift"] = torch.tensor(_SHIFT)[None, :, None, None]
    path = tmp_path / "lpips.pth"
    torch.save(sd, path)
    loaded = load_torch_lpips(str(path))
    assert set(loaded) == set(p)
    for k in p:
        np.testing.assert_array_equal(loaded[k], p[k])


def _tiny_vit_params(rng, d=32, depth=2, patch=4, n0_grid=4,
                     layerscale=True):
    p = {
        "patch_embed.proj.weight": rng.normal(
            size=(d, 3, patch, patch)).astype(np.float32) * 0.2,
        "patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "pos_embed": rng.normal(
            size=(1, 1 + n0_grid * n0_grid, d)).astype(np.float32) * 0.1,
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        pre = f"blocks.{i}"
        p[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
        p[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
        p[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
        p[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
        p[f"{pre}.attn.qkv.weight"] = rng.normal(
            size=(3 * d, d)).astype(np.float32) * 0.1
        p[f"{pre}.attn.qkv.bias"] = rng.normal(size=(3 * d,)) \
            .astype(np.float32) * 0.1
        p[f"{pre}.attn.proj.weight"] = rng.normal(
            size=(d, d)).astype(np.float32) * 0.1
        p[f"{pre}.attn.proj.bias"] = np.zeros(d, np.float32)
        p[f"{pre}.mlp.fc1.weight"] = rng.normal(
            size=(4 * d, d)).astype(np.float32) * 0.1
        p[f"{pre}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        p[f"{pre}.mlp.fc2.weight"] = rng.normal(
            size=(d, 4 * d)).astype(np.float32) * 0.1
        p[f"{pre}.mlp.fc2.bias"] = np.zeros(d, np.float32)
        if layerscale:
            p[f"{pre}.ls1.gamma"] = rng.uniform(
                0.5, 1.5, size=(d,)).astype(np.float32)
            p[f"{pre}.ls2.gamma"] = rng.uniform(
                0.5, 1.5, size=(d,)).astype(np.float32)
    return p


def _torch_vit(p, img, num_heads):
    """Independent torch ViT forward using nn.MultiheadAttention."""
    from fisher_nerf_customized_tpu.models.perceptual import _IN_MEAN, _IN_STD
    x = (torch.tensor(img) - torch.tensor(_IN_MEAN)) / torch.tensor(_IN_STD)
    w = torch.tensor(p["patch_embed.proj.weight"])
    patch = w.shape[-1]
    x = F.conv2d(x.permute(2, 0, 1)[None], w,
                 torch.tensor(p["patch_embed.proj.bias"]), stride=patch)
    _n, d, gh, gw = x.shape
    toks = x[0].reshape(d, gh * gw).T
    toks = torch.cat([torch.tensor(p["cls_token"])[0], toks], 0)
    toks = toks + torch.tensor(p["pos_embed"])[0]   # grids match in test
    depth = 1 + max(int(k.split(".")[1]) for k in p if k.startswith("blocks."))
    for i in range(depth):
        pre = f"blocks.{i}"
        ln1 = F.layer_norm(toks, (d,), torch.tensor(p[f"{pre}.norm1.weight"]),
                           torch.tensor(p[f"{pre}.norm1.bias"]), eps=1e-6)
        mha = torch.nn.MultiheadAttention(d, num_heads, batch_first=True)
        with torch.no_grad():
            mha.in_proj_weight.copy_(torch.tensor(p[f"{pre}.attn.qkv.weight"]))
            mha.in_proj_bias.copy_(torch.tensor(p[f"{pre}.attn.qkv.bias"]))
            mha.out_proj.weight.copy_(
                torch.tensor(p[f"{pre}.attn.proj.weight"]))
            mha.out_proj.bias.copy_(torch.tensor(p[f"{pre}.attn.proj.bias"]))
            h, _ = mha(ln1[None], ln1[None], ln1[None], need_weights=False)
        if f"{pre}.ls1.gamma" in p:
            h = h * torch.tensor(p[f"{pre}.ls1.gamma"])
        toks = toks + h[0]
        ln2 = F.layer_norm(toks, (d,), torch.tensor(p[f"{pre}.norm2.weight"]),
                           torch.tensor(p[f"{pre}.norm2.bias"]), eps=1e-6)
        m = F.linear(ln2, torch.tensor(p[f"{pre}.mlp.fc1.weight"]),
                     torch.tensor(p[f"{pre}.mlp.fc1.bias"]))
        m = F.linear(F.gelu(m), torch.tensor(p[f"{pre}.mlp.fc2.weight"]),
                     torch.tensor(p[f"{pre}.mlp.fc2.bias"]))
        if f"{pre}.ls2.gamma" in p:
            m = m * torch.tensor(p[f"{pre}.ls2.gamma"])
        toks = toks + m
    toks = F.layer_norm(toks, (d,), torch.tensor(p["norm.weight"]),
                        torch.tensor(p["norm.bias"]), eps=1e-6)
    return toks[1:].numpy()


@pytest.mark.parametrize("layerscale", [True, False])
def test_vit_matches_torch(layerscale):
    rng = np.random.default_rng(2)
    p = _tiny_vit_params(rng, layerscale=layerscale)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    got = np.asarray(vit_patch_descriptors(p, img, 2))
    want = _torch_vit(p, img, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_vit_pos_embed_interpolation_runs():
    rng = np.random.default_rng(3)
    p = _tiny_vit_params(rng, n0_grid=4)
    img = rng.uniform(size=(24, 24, 3)).astype(np.float32)   # 6x6 grid
    out = np.asarray(vit_patch_descriptors(p, img, 2))
    assert out.shape == (36, 32)
    assert np.isfinite(out).all()


def test_vit_loader_and_extractor(tmp_path):
    rng = np.random.default_rng(4)
    p = _tiny_vit_params(rng)
    path = tmp_path / "vit.pth"
    torch.save({k: torch.tensor(v) for k, v in p.items()}, path)
    params, heads = load_torch_vit(str(path))
    assert heads == max(1, 32 // 64) or heads >= 1
    ex = ViTPatchExtractor(params, num_heads=2)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    mask = np.zeros((16, 16), bool)
    mask[0:8, 0:8] = True                     # 4 of 16 patches fully masked
    d = ex(img, mask)
    assert d.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # integrates with the DinoBank gating contract
    from fisher_nerf_customized_tpu.engine.dino_gate import DinoBank
    bank = DinoBank()
    assert bank.add_if_distinct(d)
    assert not bank.add_if_distinct(d)        # identical frame gated out


def test_allow_map_veto_skips_mapping(tmp_path):
    """track_rgbd(allow_map=False) tracks but neither maps nor keyframes
    (the driver's DINO gate contract)."""
    from tests.test_object_slam import make_obj_sim, obj_cfg
    from fisher_nerf_customized_tpu.models.object_slam import (
        GaussianObjectSLAM)
    sim, scene, obj = make_obj_sim()
    oslam = GaussianObjectSLAM(obj_cfg(tmp_path))
    obs = sim.reset(start_xz=(0.0, 0.0), yaw=0.0)
    mask = obs["semantic"] == 100
    oslam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]), mask)
    n_kf0 = len(oslam.keyframe_masks)
    n0 = oslam.n_active
    for t in range(4):
        obs = sim.step(1)
        mask = obs["semantic"] == 100
        oslam.track_rgbd(obs["rgb"], obs["depth"],
                         gt_w2c=np.linalg.inv(obs["c2w"]),
                         obj_mask_2d=mask, step=t, allow_map=False)
    assert len(oslam.keyframe_masks) == n_kf0      # no keyframes added
    assert oslam.n_active == n0                    # no densification
    assert len(oslam.poses_w2c) == 5               # tracking continued


def test_render_metrics_real_lpips_toggle(tmp_path):
    from fisher_nerf_customized_tpu.engine import eval as ev
    rng = np.random.default_rng(5)
    p = _tiny_alex_params(rng)
    path = tmp_path / "lp.pth"
    torch.save({k: torch.tensor(v) for k, v in p.items()}, path)
    im1 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    im2 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    try:
        ev.set_lpips_weights(str(path))
        m = ev.render_metrics(im1, im2)
        assert "lpips" in m and np.isfinite(m["lpips"])
        assert m["lpips"] == pytest.approx(_torch_lpips(p, im1, im2),
                                           rel=1e-3)
    finally:
        ev.set_lpips_weights(None)
    assert "lpips" not in ev.render_metrics(im1, im2)
