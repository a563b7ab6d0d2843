"""DD-PPO pointgoal policy network, JAX-native.

The reference (planning/ddppo_policy.py:11-82) wraps habitat_baselines'
``PointNavResNetPolicy`` — a GroupNorm-ResNet50 depth encoder feeding a
2-layer LSTM actor-critic — and loads a pretrained torch checkpoint
("ckpt.11.pth" era).  habitat_baselines is unavailable here, so this
module re-implements that exact architecture as pure JAX functions over
a flat parameter dict whose keys ARE the torch ``state_dict`` names
(``net.visual_encoder.backbone.layer1.0.convs.0.weight`` ...), making
checkpoint loading a name-identity transfer:

  * depth (H, W, 1) -> avg_pool(2) -> GN-ResNet50 (base_planes 32,
    ngroups 16, Bottleneck [3, 4, 6, 3]) -> 3x3 compression conv to
    ~2048 flat features -> Linear -> ReLU            (visual_fc)
  * pointgoal (rho, phi) -> [rho, cos(-phi), sin(-phi)] -> Linear(3, 32)
  * prev_action -> Embedding(n_actions + 1, 32); index 0 at episode
    start (mask == 0), else action + 1
  * concat [visual | tgt | prev] -> LSTM x2 (hidden_size) ->
    CategoricalNet logits over 4 actions + value head.

Everything is a plain function of (params, inputs) so the single-step
``act`` jits once and runs per-frame on TPU.  Weight layout conventions
are torch's (conv OIHW, linear (out, in), LSTM gates i|f|g|o) — arrays
loaded from a checkpoint are used as-is, un-transposed, by matching the
einsum/conv dimension numbers instead.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# habitat resnet50: Bottleneck(expansion 4), layers [3,4,6,3],
# base_planes 32, ngroups 16 (= base_planes // 2)
_LAYERS = (3, 4, 6, 3)
_BASE_PLANES = 32
_NGROUPS = 16
_EXPANSION = 4
_EMBED = 32          # tgt embedding + prev-action embedding widths
_FLAT_TARGET = 2048  # after_compression_flat_size


# --------------------------------------------------------------------------
# primitive layers (torch weight layouts)
# --------------------------------------------------------------------------

def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _group_norm(x, w, b, ngroups, eps=1e-5):
    n, c, h, wd = x.shape
    g = x.reshape(n, ngroups, c // ngroups, h, wd)
    mu = jnp.mean(g, axis=(2, 3, 4), keepdims=True)
    var = jnp.mean((g - mu) ** 2, axis=(2, 3, 4), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(n, c, h, wd) * w[None, :, None, None] \
        + b[None, :, None, None]


def _max_pool_3s2p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def _avg_pool_2(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return s * 0.25


def _linear(x, w, b=None):
    y = x @ w.T
    return y if b is None else y + b


# --------------------------------------------------------------------------
# GroupNorm ResNet50 backbone (habitat resnet.py naming)
# --------------------------------------------------------------------------

def _bottleneck(p, prefix, x, stride, ngroups):
    out = _conv(x, p[f"{prefix}.convs.0.weight"])
    out = _group_norm(out, p[f"{prefix}.convs.1.weight"],
                      p[f"{prefix}.convs.1.bias"], ngroups)
    out = jax.nn.relu(out)
    out = _conv(out, p[f"{prefix}.convs.3.weight"], stride=stride, padding=1)
    out = _group_norm(out, p[f"{prefix}.convs.4.weight"],
                      p[f"{prefix}.convs.4.bias"], ngroups)
    out = jax.nn.relu(out)
    out = _conv(out, p[f"{prefix}.convs.6.weight"])
    out = _group_norm(out, p[f"{prefix}.convs.7.weight"],
                      p[f"{prefix}.convs.7.bias"], ngroups)
    if f"{prefix}.downsample.0.weight" in p:
        sc = _conv(x, p[f"{prefix}.downsample.0.weight"], stride=stride)
        sc = _group_norm(sc, p[f"{prefix}.downsample.1.weight"],
                         p[f"{prefix}.downsample.1.bias"], ngroups)
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _backbone(p, x, prefix="net.visual_encoder.backbone"):
    x = _conv(x, p[f"{prefix}.conv1.0.weight"], stride=2, padding=3)
    x = _group_norm(x, p[f"{prefix}.conv1.1.weight"],
                    p[f"{prefix}.conv1.1.bias"], _NGROUPS)
    x = jax.nn.relu(x)
    x = _max_pool_3s2p1(x)
    for li, n_blocks in enumerate(_LAYERS):
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            x = _bottleneck(p, f"{prefix}.layer{li + 1}.{bi}", x, stride,
                            _NGROUPS)
    return x


def _visual_encoder(p, depth_nchw):
    """depth (N, 1, H, W) in [0, 1] -> flat visual features (N, F)."""
    x = _avg_pool_2(depth_nchw)
    x = _backbone(p, x)
    x = _conv(x, p["net.visual_encoder.compression.0.weight"], padding=1)
    # compression GN uses a single group (habitat resnet_policy.py)
    x = _group_norm(x, p["net.visual_encoder.compression.1.weight"],
                    p["net.visual_encoder.compression.1.bias"], 1)
    x = jax.nn.relu(x)
    return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------------
# LSTM state encoder (torch gate order i | f | g | o)
# --------------------------------------------------------------------------

def _lstm_step(p, layer, x, h, c):
    wi = p[f"net.state_encoder.rnn.weight_ih_l{layer}"]
    wh = p[f"net.state_encoder.rnn.weight_hh_l{layer}"]
    bi = p[f"net.state_encoder.rnn.bias_ih_l{layer}"]
    bh = p[f"net.state_encoder.rnn.bias_hh_l{layer}"]
    gates = x @ wi.T + h @ wh.T + bi + bh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _state_encoder(p, x, hidden, mask, num_layers=2):
    """hidden: (2, L, N, H) stacked (h, c); mask 0 resets the state."""
    h_all, c_all = hidden[0] * mask, hidden[1] * mask
    hs, cs = [], []
    for layer in range(num_layers):
        h, c = _lstm_step(p, layer, x, h_all[layer], c_all[layer])
        hs.append(h)
        cs.append(c)
        x = h
    return x, jnp.stack([jnp.stack(hs), jnp.stack(cs)])


# --------------------------------------------------------------------------
# full policy forward
# --------------------------------------------------------------------------

def forward(params, depth, pointgoal, hidden, prev_action, mask):
    """One policy step.

    depth: (N, H, W, 1) in [0, 1]; pointgoal: (N, 2) (rho, phi);
    hidden: (2, L, N, H); prev_action: (N,) int32; mask: (N,) 0. at
    episode start else 1.  Returns (logits, value, new_hidden).
    """
    n = depth.shape[0]
    vis = _visual_encoder(params, jnp.transpose(depth, (0, 3, 1, 2)))
    vis = jax.nn.relu(_linear(vis, params["net.visual_fc.1.weight"],
                              params["net.visual_fc.1.bias"]))
    rho, phi = pointgoal[:, 0], pointgoal[:, 1]
    tgt = jnp.stack([rho, jnp.cos(-phi), jnp.sin(-phi)], axis=-1)
    tgt = _linear(tgt, params["net.tgt_embeding.weight"],
                  params["net.tgt_embeding.bias"])
    # index 0 = start token when mask == 0, else action + 1
    idx = ((prev_action.astype(jnp.float32) + 1.0) * mask).astype(jnp.int32)
    prev = params["net.prev_action_embedding.weight"][idx]
    x = jnp.concatenate([vis, tgt, prev], axis=-1)
    feats, new_hidden = _state_encoder(params, x, hidden,
                                       mask.reshape(1, n, 1))
    logits = _linear(feats, params["action_distribution.linear.weight"],
                     params["action_distribution.linear.bias"])
    value = _linear(feats, params["critic.fc.weight"],
                    params["critic.fc.bias"])
    return logits, value[:, 0], new_hidden


@functools.partial(jax.jit, static_argnames=("deterministic",))
def act(params, depth, pointgoal, hidden, prev_action, mask, rng,
        deterministic=False):
    logits, value, new_hidden = forward(params, depth, pointgoal, hidden,
                                        prev_action, mask)
    if deterministic:
        action = jnp.argmax(logits, axis=-1)
    else:
        action = jax.random.categorical(rng, logits, axis=-1)
    return action.astype(jnp.int32), value, new_hidden


# --------------------------------------------------------------------------
# parameter construction / checkpoint loading
# --------------------------------------------------------------------------

def compression_channels(input_hw: int) -> tuple[int, int]:
    """(num_compression_channels, final_spatial) for a square depth input,
    mirroring habitat ResNetEncoder's sizing: avg_pool(2) then a 1/32
    backbone compression, channels chosen so the flat size is ~2048."""
    final_spatial = max(int((input_hw // 2) * (1.0 / 32.0)), 1)
    n_ch = int(round(_FLAT_TARGET / (final_spatial ** 2)))
    return n_ch, final_spatial


def param_shapes(hidden_size: int = 512, input_hw: int = 256,
                 n_actions: int = 4) -> dict[str, tuple[int, ...]]:
    """Flat torch-named parameter spec for the full actor-critic."""
    shapes: dict[str, tuple[int, ...]] = {}
    bb = "net.visual_encoder.backbone"
    shapes[f"{bb}.conv1.0.weight"] = (_BASE_PLANES, 1, 7, 7)
    shapes[f"{bb}.conv1.1.weight"] = (_BASE_PLANES,)
    shapes[f"{bb}.conv1.1.bias"] = (_BASE_PLANES,)
    inplanes = _BASE_PLANES
    for li, n_blocks in enumerate(_LAYERS):
        planes = _BASE_PLANES * (2 ** li)
        for bi in range(n_blocks):
            pre = f"{bb}.layer{li + 1}.{bi}"
            shapes[f"{pre}.convs.0.weight"] = (planes, inplanes, 1, 1)
            shapes[f"{pre}.convs.1.weight"] = (planes,)
            shapes[f"{pre}.convs.1.bias"] = (planes,)
            shapes[f"{pre}.convs.3.weight"] = (planes, planes, 3, 3)
            shapes[f"{pre}.convs.4.weight"] = (planes,)
            shapes[f"{pre}.convs.4.bias"] = (planes,)
            out_planes = planes * _EXPANSION
            shapes[f"{pre}.convs.6.weight"] = (out_planes, planes, 1, 1)
            shapes[f"{pre}.convs.7.weight"] = (out_planes,)
            shapes[f"{pre}.convs.7.bias"] = (out_planes,)
            stride = 2 if (li > 0 and bi == 0) else 1
            if stride != 1 or inplanes != out_planes:
                shapes[f"{pre}.downsample.0.weight"] = \
                    (out_planes, inplanes, 1, 1)
                shapes[f"{pre}.downsample.1.weight"] = (out_planes,)
                shapes[f"{pre}.downsample.1.bias"] = (out_planes,)
            inplanes = out_planes
    n_comp, final_spatial = compression_channels(input_hw)
    ve = "net.visual_encoder.compression"
    shapes[f"{ve}.0.weight"] = (n_comp, inplanes, 3, 3)
    shapes[f"{ve}.1.weight"] = (n_comp,)
    shapes[f"{ve}.1.bias"] = (n_comp,)
    flat = n_comp * final_spatial * final_spatial
    shapes["net.visual_fc.1.weight"] = (hidden_size, flat)
    shapes["net.visual_fc.1.bias"] = (hidden_size,)
    shapes["net.tgt_embeding.weight"] = (_EMBED, 3)
    shapes["net.tgt_embeding.bias"] = (_EMBED,)
    shapes["net.prev_action_embedding.weight"] = (n_actions + 1, _EMBED)
    rnn_in = hidden_size + 2 * _EMBED
    for layer in range(2):
        in_sz = rnn_in if layer == 0 else hidden_size
        shapes[f"net.state_encoder.rnn.weight_ih_l{layer}"] = \
            (4 * hidden_size, in_sz)
        shapes[f"net.state_encoder.rnn.weight_hh_l{layer}"] = \
            (4 * hidden_size, hidden_size)
        shapes[f"net.state_encoder.rnn.bias_ih_l{layer}"] = (4 * hidden_size,)
        shapes[f"net.state_encoder.rnn.bias_hh_l{layer}"] = (4 * hidden_size,)
    shapes["action_distribution.linear.weight"] = (n_actions, hidden_size)
    shapes["action_distribution.linear.bias"] = (n_actions,)
    shapes["critic.fc.weight"] = (1, hidden_size)
    shapes["critic.fc.bias"] = (1,)
    return shapes


def init_params(rng: np.random.Generator | int = 0, hidden_size: int = 512,
                input_hw: int = 256, n_actions: int = 4):
    """Random fan-in init with the exact checkpoint shapes (for tests and
    for running the policy untrained)."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    params = {}
    for name, shp in param_shapes(hidden_size, input_hw, n_actions).items():
        if name.endswith(".bias") or ".1.weight" in name \
                or ".4.weight" in name or ".7.weight" in name \
                or "downsample.1" in name or "conv1.1" in name \
                or "compression.1" in name:
            # norm scales start at 1, biases at 0
            val = np.ones(shp, np.float32) if name.endswith("weight") \
                else np.zeros(shp, np.float32)
        else:
            fan_in = int(np.prod(shp[1:])) if len(shp) > 1 else shp[0]
            std = 1.0 / math.sqrt(max(fan_in, 1))
            val = rng.normal(0.0, std, size=shp).astype(np.float32)
        params[name] = jnp.asarray(val)
    return params


def zero_state(hidden_size: int, batch: int = 1, num_layers: int = 2):
    return jnp.zeros((2, num_layers, batch, hidden_size), jnp.float32)


def load_torch_checkpoint(path: str, input_hw: int = 256):
    """Load a habitat DD-PPO checkpoint into the flat param dict.

    Mirrors the reference's key handling (ddppo_policy.py:37-56): strips
    the ``actor_critic.`` prefix, reads hidden_size from
    ``config.RL.PPO.hidden_size`` or ``model_args.hidden_size``.
    Returns (params, hidden_size)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "config" in ckpt and hasattr(ckpt["config"], "RL"):
        hidden_size = ckpt["config"].RL.PPO.hidden_size
    elif "model_args" in ckpt:
        hidden_size = ckpt["model_args"].hidden_size
    else:
        hidden_size = 512
    sd = {k[len("actor_critic."):]: v
          for k, v in ckpt["state_dict"].items() if "actor_critic" in k}
    want = param_shapes(int(hidden_size), input_hw=input_hw)
    params = {}
    for name, shp in want.items():
        if name not in sd:
            raise KeyError(f"checkpoint missing parameter {name}")
        arr = np.asarray(sd[name].detach().cpu().numpy(), np.float32)
        if tuple(arr.shape) != tuple(shp):
            raise ValueError(
                f"{name}: checkpoint shape {tuple(arr.shape)} != "
                f"expected {tuple(shp)}")
        params[name] = jnp.asarray(arr)
    return params, int(hidden_size)
