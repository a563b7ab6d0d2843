"""Pretrained perceptual networks, JAX-native: LPIPS(AlexNet) + ViT patch
descriptors (DINOv2-style).

The reference evaluates render quality with the `lpips` package's AlexNet
variant (ref: tester_gaussians_navigation.py:1491 `lpips.LPIPS(net='alex')`)
and gates object keyframes with DINOv2 patch descriptors (ref:
tester_gaussians_navigation.py:628-768 call sites; the reference's own
dino_extract.py / dino_utils.py are absent from its repo, so the call-site
contract is the spec).  Pretrained weights are not shipped in this offline
environment, so these networks follow the `planning/ddppo_net.py` pattern:
pure JAX forward functions over a FLAT parameter dict whose keys ARE the
torch ``state_dict`` names, making checkpoint loading a name-identity
transfer.  Weight layouts are torch's (conv OIHW, linear (out, in)); arrays
are used un-transposed by matching conv dimension numbers / einsum order.

Without a weight path the offline defaults remain the named substitutes
(`engine/eval.py:lpips_proxy`, `engine/dino_gate.py:PatchDescriptorExtractor`).
With one (`--lpips_weights`, `--dino_weights`), the real architectures run.

LPIPS(alex) math (lpips package v0.1, `lpips/lpips.py`):
  x in [0,1] -> 2x-1 -> ScalingLayer (x - shift)/scale -> torchvision
  alexnet.features taps after relu1/2/3/4/5 -> unit-normalize over channels
  (eps 1e-10) -> squared diff -> per-layer 1x1 "lin" conv (nonneg weights)
  -> spatial mean -> sum over the 5 layers.

ViT (DINOv2 ViT-*/14, `dinov2/models/vision_transformer.py` key names):
  patch_embed.proj (14x14 s14 conv) -> [cls | patches] + interpolated
  pos_embed -> blocks (pre-LN MHSA with optional LayerScale ls1/ls2, MLP
  GELU) -> final norm -> patch tokens as descriptors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# LPIPS (AlexNet)
# ---------------------------------------------------------------------------

# torchvision alexnet.features conv indices and their (kernel, stride, pad);
# LPIPS taps the ReLU after each of these convs.  A max-pool(3,2) precedes
# convs 3 and 6 (features indices 2 and 5).
_ALEX_CONVS = ((0, 11, 4, 2), (3, 5, 1, 2), (6, 3, 1, 1),
               (8, 3, 1, 1), (10, 3, 1, 1))
_POOL_BEFORE = {3, 6}

# lpips.ScalingLayer buffers (identical across all LPIPS nets)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_nchw(x, w, b=None, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y if b is None else y + b[None, :, None, None]


def _max_pool_32(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _alex_feats(params, x):
    """x: (N,3,H,W) already scaled; returns the 5 tapped feature maps."""
    feats = []
    for idx, _k, s, p in _ALEX_CONVS:
        if idx in _POOL_BEFORE:
            x = _max_pool_32(x)
        x = _conv_nchw(x, params[f"features.{idx}.weight"],
                       params[f"features.{idx}.bias"], s, p)
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _unit_norm_ch(x, eps=1e-10):
    # lpips.normalize_tensor: x / sqrt(sum_ch x^2 + eps)
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + eps)
    return x / n


@functools.partial(jax.jit, static_argnames=())
def lpips_alex(params, img1, img2):
    """LPIPS(alex) distance between two (H,W,3) images in [0,1].

    params: flat dict with torchvision keys ``features.{0,3,6,8,10}.weight/
    bias`` and lpips keys ``lin{0..4}.model.1.weight``.
    """
    def prep(im):
        x = jnp.transpose(jnp.asarray(im, jnp.float32)[None], (0, 3, 1, 2))
        x = x * 2.0 - 1.0
        return (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]

    f1 = _alex_feats(params, prep(img1))
    f2 = _alex_feats(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_norm_ch(a) - _unit_norm_ch(b)) ** 2
        w = params[f"lin{i}.model.1.weight"]        # (1, C, 1, 1)
        total = total + jnp.mean(_conv_nchw(d, w), axis=(1, 2, 3))[0]
    return total


def load_torch_lpips(path: str, alexnet_path: str | None = None) -> dict:
    """Load LPIPS weights into the flat numpy dict `lpips_alex` expects.

    Accepts either (a) one checkpoint holding both backbone + lin weights
    (full ``lpips.LPIPS`` state_dict — ``net.sliceK.J.*`` names are
    remapped to ``features.J.*``), or (b) the distributed
    ``lpips/weights/v0.1/alex.pth`` (lin-only) plus the torchvision
    ``alexnet-owt`` checkpoint via `alexnet_path`.
    """
    import torch
    out = {}

    def ingest(sd):
        for k, v in sd.items():
            arr = np.asarray(v.detach().cpu().numpy(), np.float32)
            if k.startswith("net.slice"):
                k = "features." + k.split(".", 2)[2]   # net.slice1.0.w -> features.0.w
            if k.startswith("scaling_layer."):
                continue                                # constants above
            out[k] = arr

    ingest(torch.load(path, map_location="cpu"))
    if alexnet_path is not None:
        ingest(torch.load(alexnet_path, map_location="cpu"))
    missing = [k for k in ("features.0.weight", "lin0.model.1.weight")
               if k not in out]
    if missing:
        raise ValueError(f"LPIPS checkpoint missing keys: {missing}")
    return out


# ---------------------------------------------------------------------------
# ViT patch descriptors (DINOv2-style)
# ---------------------------------------------------------------------------

def _layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, w, b=None):
    y = x @ w.T
    return y if b is None else y + b


def _attn(p, pre, x, num_heads):
    t, d = x.shape
    qkv = _linear(x, p[f"{pre}.attn.qkv.weight"],
                  p.get(f"{pre}.attn.qkv.bias"))          # (T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // num_heads

    def heads(z):
        return z.reshape(t, num_heads, hd).transpose(1, 0, 2)
    q, k, v = heads(q), heads(k), heads(v)
    a = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(hd), axis=-1)
    o = (a @ v).transpose(1, 0, 2).reshape(t, d)
    return _linear(o, p[f"{pre}.attn.proj.weight"],
                   p.get(f"{pre}.attn.proj.bias"))


def _block(p, i, x, num_heads):
    pre = f"blocks.{i}"
    h = _attn(p, pre, _layer_norm(x, p[f"{pre}.norm1.weight"],
                                  p[f"{pre}.norm1.bias"]), num_heads)
    if f"{pre}.ls1.gamma" in p:                    # DINOv2 LayerScale
        h = h * p[f"{pre}.ls1.gamma"]
    x = x + h
    m = _layer_norm(x, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
    m = _linear(m, p[f"{pre}.mlp.fc1.weight"], p.get(f"{pre}.mlp.fc1.bias"))
    m = jax.nn.gelu(m, approximate=False)
    m = _linear(m, p[f"{pre}.mlp.fc2.weight"], p.get(f"{pre}.mlp.fc2.bias"))
    if f"{pre}.ls2.gamma" in p:
        m = m * p[f"{pre}.ls2.gamma"]
    return x + m


def _n_blocks(params):
    return 1 + max(int(k.split(".")[1]) for k in params
                   if k.startswith("blocks."))


def _interp_pos_embed(pos, gh, gw):
    """pos: (1, 1+N0, D) -> (1+gh*gw, D) with the patch grid bicubically
    resized (DINOv2 interpolate_pos_encoding)."""
    cls, patch = pos[0, :1], pos[0, 1:]
    n0 = patch.shape[0]
    g0 = int(round(float(np.sqrt(n0))))
    d = patch.shape[-1]
    if (g0, g0) != (gh, gw):
        grid = patch.reshape(g0, g0, d)
        grid = jax.image.resize(grid, (gh, gw, d), "bicubic")
        patch = grid.reshape(gh * gw, d)
    return jnp.concatenate([cls, patch], axis=0)


# ImageNet normalization used by DINOv2 preprocessing
_IN_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IN_STD = np.array([0.229, 0.224, 0.225], np.float32)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def vit_patch_descriptors(params, img, num_heads: int):
    """img: (H,W,3) in [0,1], H and W multiples of the patch size.
    Returns (gh*gw, D) final-norm patch tokens (cls/register dropped)."""
    x = (jnp.asarray(img, jnp.float32) - _IN_MEAN) / _IN_STD
    w = params["patch_embed.proj.weight"]          # (D, 3, P, P)
    p_sz = w.shape[-1]
    x = _conv_nchw(jnp.transpose(x[None], (0, 3, 1, 2)), w,
                   params.get("patch_embed.proj.bias"), stride=p_sz)
    _n, d, gh, gw = x.shape
    tokens = x[0].reshape(d, gh * gw).T            # (N, D)
    tokens = jnp.concatenate([params["cls_token"][0], tokens], axis=0)
    tokens = tokens + _interp_pos_embed(params["pos_embed"], gh, gw)
    n_extra = 1
    if "register_tokens" in params:
        reg = params["register_tokens"][0]
        tokens = jnp.concatenate([tokens[:1], reg, tokens[1:]], axis=0)
        n_extra += reg.shape[0]
    for i in range(_n_blocks(params)):
        tokens = _block(params, i, tokens, num_heads)
    tokens = _layer_norm(tokens, params["norm.weight"], params["norm.bias"])
    return tokens[n_extra:]


def load_torch_vit(path: str) -> tuple[dict, int]:
    """Load a DINO/DINOv2 ViT torch checkpoint -> (flat numpy dict,
    num_heads).  Head count follows the DINOv2 family rule D/64
    (S:384/6, B:768/12, L:1024/16)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    sd = sd.get("model", sd) if isinstance(sd.get("model", None), dict) else sd
    params = {k: np.asarray(v.detach().cpu().numpy(), np.float32)
              for k, v in sd.items() if hasattr(v, "detach")}
    for req in ("patch_embed.proj.weight", "cls_token", "pos_embed",
                "norm.weight"):
        if req not in params:
            raise ValueError(f"ViT checkpoint missing key: {req}")
    d = params["patch_embed.proj.weight"].shape[0]
    return params, max(1, d // 64)


class ViTPatchExtractor:
    """Drop-in for `engine.dino_gate.PatchDescriptorExtractor`:
    (H,W,3) rgb + (H,W) mask -> (N,D) L2-normalized ViT patch descriptors
    of the patches whose mask fraction >= min_mask_frac."""

    def __init__(self, params: dict, num_heads: int,
                 min_mask_frac: float = 0.3):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.num_heads = int(num_heads)
        self.min_frac = float(min_mask_frac)
        self.patch = int(params["patch_embed.proj.weight"].shape[-1])

    @classmethod
    def from_checkpoint(cls, path: str, **kw):
        params, heads = load_torch_vit(path)
        return cls(params, heads, **kw)

    def __call__(self, rgb: np.ndarray, mask: np.ndarray) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        mask = np.asarray(mask, bool)
        p = self.patch
        gh, gw = mask.shape[0] // p, mask.shape[1] // p
        if gh == 0 or gw == 0:
            return np.zeros((0, 1), np.float32)
        rgb = rgb[:gh * p, :gw * p]
        frac = mask[:gh * p, :gw * p].reshape(gh, p, gw, p) \
            .mean(axis=(1, 3)).reshape(-1)
        keep = frac >= self.min_frac
        if not keep.any():
            return np.zeros((0, 1), np.float32)
        toks = np.asarray(
            vit_patch_descriptors(self.params, rgb, self.num_heads))
        toks = toks[keep]
        n = np.linalg.norm(toks, axis=1, keepdims=True)
        return (toks / np.maximum(n, 1e-8)).astype(np.float32)
