"""PyTorch checkpoint -> Flax variables converter.

Ingests the reference's published ``.pth`` files (README.md:20-21, 60-63:
anomaly ``encoder_epoch_*.pth``/``decoder_epoch_*.pth`` state_dicts and
DeepLab ``{cur_itrs, model_state, ...}`` dicts, main.py:315-325) and emits
the NHWC Flax ``{"params": ..., "batch_stats": ...}`` trees of the matching
models in this package.

Key translation is rule-based (regex -> dotted flax path); tensor layout:
conv ``(O, I/g, kh, kw) -> (kh, kw, I/g, O)``; BN ``weight/bias/
running_mean/running_var -> scale/bias (params) + mean/var (batch_stats)``.

SyncBN quirk note: the reference SyncBN tracks a cumulative moving average in
``_tmp_running_mean / _running_iter`` (batchnorm.py:49-54, 132-137) but its
``running_mean/running_var`` buffers hold the final statistics used at eval —
those are what we ingest; the temp buffers are dropped.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


# ---------------------------------------------------------------------------
# encoder (CSAIL ResNet / ResNeXt deep stem; torchvision stem)


def _translate_resnet_key(key: str, deep_stem: bool):
    """torch resnet key -> (flax_path_without_leaf, leaf_kind)."""
    m = re.match(r"^conv([123])\.weight$", key)
    if m:
        return f"stem{m.group(1)}/conv", "conv"
    m = re.match(r"^bn([123])\.(\w+)$", key)
    if m:
        return f"stem{m.group(1)}/bn", m.group(2)
    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        return f"layer{m.group(1)}_{m.group(2)}/c{m.group(3)}/conv", "conv"
    m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", key)
    if m:
        return f"layer{m.group(1)}_{m.group(2)}/c{m.group(3)}/bn", m.group(4)
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        return f"layer{m.group(1)}_{m.group(2)}/down/conv", "conv"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", key)
    if m:
        return f"layer{m.group(1)}_{m.group(2)}/down/bn", m.group(3)
    return None


# ---------------------------------------------------------------------------
# decoders (PPM family / C1 family)


def _translate_decoder_key(key: str):
    m = re.match(r"^ppm\.(\d)\.1\.weight$", key)
    if m:
        return f"ppm/ppm{m.group(1)}/conv", "conv"
    m = re.match(r"^ppm\.(\d)\.2\.(\w+)$", key)
    if m:
        return f"ppm/ppm{m.group(1)}/bn", m.group(2)
    m = re.match(r"^conv_last\.0\.weight$", key)
    if m:
        return "conv_last/fuse/conv", "conv"
    m = re.match(r"^conv_last\.1\.(\w+)$", key)
    if m:
        return "conv_last/fuse/bn", m.group(1)
    m = re.match(r"^conv_last\.4\.(weight|bias)$", key)
    if m:
        return "conv_last/out/conv", {"weight": "conv", "bias": "cbias"}[m.group(1)]
    m = re.match(r"^cbr_deepsup\.0\.weight$", key)
    if m:
        return "deepsup/cbr_deepsup/conv", "conv"
    m = re.match(r"^cbr_deepsup\.1\.(\w+)$", key)
    if m:
        return "deepsup/cbr_deepsup/bn", m.group(1)
    m = re.match(r"^conv_last_deepsup\.(weight|bias)$", key)
    if m:
        return ("deepsup/conv_last_deepsup/conv",
                {"weight": "conv", "bias": "cbias"}[m.group(1)])
    # C1 family
    m = re.match(r"^cbr\.0\.weight$", key)
    if m:
        return "cbr/conv", "conv"
    m = re.match(r"^cbr\.1\.(\w+)$", key)
    if m:
        return "cbr/bn", m.group(1)
    m = re.match(r"^conv_last\.(weight|bias)$", key)
    if m:
        return "conv_last/conv", {"weight": "conv", "bias": "cbias"}[m.group(1)]
    return None


# ---------------------------------------------------------------------------
# DeepLab heads


def _translate_deeplab_head_key(key: str):
    """DeepLabHeadV3Plus state_dict keys (relative, no 'classifier.' prefix)."""
    m = re.match(r"^project\.0\.weight$", key)
    if m:
        return "project/conv", "conv"
    m = re.match(r"^project\.1\.(\w+)$", key)
    if m:
        return "project/bn", m.group(1)
    m = re.match(r"^aspp\.convs\.0\.0\.weight$", key)
    if m:
        return "aspp/b0/conv", "conv"
    m = re.match(r"^aspp\.convs\.0\.1\.(\w+)$", key)
    if m:
        return "aspp/b0/bn", m.group(1)
    m = re.match(r"^aspp\.convs\.([123])\.0\.weight$", key)
    if m:
        return f"aspp/b{m.group(1)}/conv", "conv"
    m = re.match(r"^aspp\.convs\.([123])\.1\.(\w+)$", key)
    if m:
        return f"aspp/b{m.group(1)}/bn", m.group(2)
    m = re.match(r"^aspp\.convs\.4\.1\.weight$", key)
    if m:
        return "aspp/pool/conv", "conv"
    m = re.match(r"^aspp\.convs\.4\.2\.(\w+)$", key)
    if m:
        return "aspp/pool/bn", m.group(1)
    m = re.match(r"^aspp\.project\.0\.weight$", key)
    if m:
        return "aspp/project/conv", "conv"
    m = re.match(r"^aspp\.project\.1\.(\w+)$", key)
    if m:
        return "aspp/project/bn", m.group(1)
    m = re.match(r"^classifier\.0\.weight$", key)
    if m:
        return "fuse/conv", "conv"
    m = re.match(r"^classifier\.1\.(\w+)$", key)
    if m:
        return "fuse/bn", m.group(1)
    m = re.match(r"^classifier\.3\.(weight|bias)$", key)
    if m:
        return "classifier/conv", {"weight": "conv", "bias": "cbias"}[m.group(1)]
    return None


_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _insert(variables, flax_dir, kind, tensor):
    arr = np.asarray(tensor)
    if kind == "conv":
        _set(variables["params"], flax_dir + "/kernel", _conv_kernel(arr))
    elif kind == "cbias":
        _set(variables["params"], flax_dir + "/bias", arr)
    elif kind in _BN_LEAVES:
        col, leaf = _BN_LEAVES[kind]
        _set(variables[col], flax_dir + "/" + leaf, arr)
    elif kind in ("num_batches_tracked",):
        pass
    else:
        raise KeyError(f"unhandled leaf kind {kind} at {flax_dir}")


def _convert(state_dict, translate, strict=True):
    variables = {"params": {}, "batch_stats": {}}
    skipped = []
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("num_batches_tracked") or "_tmp_running" in key \
                or key.endswith("_running_iter") or key == "centers":
            continue
        out = translate(key)
        if out is None:
            skipped.append(key)
            continue
        flax_dir, kind = out
        _insert(variables, flax_dir, kind, tensor)
    if strict and skipped:
        raise KeyError(f"untranslated torch keys: {skipped[:10]}"
                       f" (+{max(0, len(skipped) - 10)} more)")
    return variables, skipped


def convert_csail_encoder(state_dict, strict=True):
    """anomaly encoder_epoch_N.pth (ResNet deep stem) -> flax variables."""
    return _convert(state_dict,
                    lambda k: _translate_resnet_key(k, deep_stem=True),
                    strict)[0]


def _translate_upernet_key(key: str):
    """UPerNet decoder keys (models.py:690-777). Kept separate from the
    PPM/C1 translator: UPerNet's conv_last.1 is the final Conv2d while
    PPM's conv_last.1 is a BN — same key, different meaning."""
    m = re.match(r"^ppm_conv\.(\d)\.0\.weight$", key)
    if m:
        return f"ppm_conv{m.group(1)}/conv", "conv"
    m = re.match(r"^ppm_conv\.(\d)\.1\.(\w+)$", key)
    if m:
        return f"ppm_conv{m.group(1)}/bn", m.group(2)
    m = re.match(r"^ppm_last_conv\.0\.weight$", key)
    if m:
        return "ppm_last_conv/conv", "conv"
    m = re.match(r"^ppm_last_conv\.1\.(\w+)$", key)
    if m:
        return "ppm_last_conv/bn", m.group(1)
    m = re.match(r"^fpn_in\.(\d)\.0\.weight$", key)
    if m:
        return f"fpn_in{m.group(1)}/conv", "conv"
    m = re.match(r"^fpn_in\.(\d)\.1\.(\w+)$", key)
    if m:
        return f"fpn_in{m.group(1)}/bn", m.group(2)
    m = re.match(r"^fpn_out\.(\d)\.0\.0\.weight$", key)
    if m:
        return f"fpn_out{m.group(1)}/conv", "conv"
    m = re.match(r"^fpn_out\.(\d)\.0\.1\.(\w+)$", key)
    if m:
        return f"fpn_out{m.group(1)}/bn", m.group(2)
    m = re.match(r"^conv_last\.0\.0\.weight$", key)
    if m:
        return "conv_fusion/conv", "conv"
    m = re.match(r"^conv_last\.0\.1\.(\w+)$", key)
    if m:
        return "conv_fusion/bn", m.group(1)
    m = re.match(r"^conv_last\.1\.(weight|bias)$", key)
    if m:
        return "conv_last/conv", {"weight": "conv", "bias": "cbias"}[m.group(1)]
    return None


def convert_decoder(state_dict, strict=True):
    """anomaly decoder_epoch_N.pth (PPM/C1/UPerNet family) -> flax
    variables; the UPerNet layout is auto-detected by its fpn keys."""
    is_upernet = any(k.startswith("fpn_in.") for k in state_dict)
    translate = _translate_upernet_key if is_upernet \
        else _translate_decoder_key
    return _convert(state_dict, translate, strict)[0]


def convert_segmentation_model(enc_state, dec_state, strict=True):
    """Paired encoder/decoder -> variables for models.SegmentationModel."""
    enc = convert_csail_encoder(enc_state, strict)
    dec = convert_decoder(dec_state, strict)
    return {
        "params": {"encoder": enc["params"], "decoder": dec["params"]},
        "batch_stats": {"encoder": enc["batch_stats"],
                        "decoder": dec["batch_stats"]},
    }


def _translate_deeplab_model_key(key: str, head_names=("classifier",)):
    if key.startswith("backbone."):
        sub = _translate_resnet_key(key[len("backbone."):], deep_stem=False)
        if sub is None:
            return None
        return "backbone/" + sub[0], sub[1]
    for head in head_names:
        prefix = head + "."
        if key.startswith(prefix):
            sub = _translate_deeplab_head_key(key[len(prefix):])
            if sub is None:
                return None
            # our wrapper names the single head "head"; self-distillation
            # keeps the reference names classifier / classifier_N
            flax_head = "head" if head_names == ("classifier",) else head
            return f"{flax_head}/" + sub[0], sub[1]
    return None


def convert_deeplab_checkpoint(ckpt, head_names=("classifier",), strict=True):
    """DeepLab checkpoint dict (or bare model_state) -> flax variables.

    ``head_names=('classifier', 'classifier_1', ...)`` for the
    self-distillation multi-head model; partial loads (reference
    test_self_distillation.py:511-518) are expressed with ``strict=False``.
    """
    state = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    return _convert(
        state, lambda k: _translate_deeplab_model_key(k, head_names),
        strict)[0]


def _translate_hrnet_key(key: str):
    """anomaly HRNetV2-W48 keys (anomaly/models/hrnet.py) -> flax paths of
    models/hrnet.py. The classification-head leftovers (incre/downsamp/final
    layers, unused by the segmentation forward) translate to None."""
    m = re.match(r"^conv([12])\.weight$", key)
    if m:
        return f"stem{m.group(1)}/conv", "conv"
    m = re.match(r"^bn([12])\.(\w+)$", key)
    if m:
        return f"stem{m.group(1)}/bn", m.group(2)
    m = re.match(r"^layer1\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        return f"layer1_{m.group(1)}/c{m.group(2)}/conv", "conv"
    m = re.match(r"^layer1\.(\d+)\.bn(\d)\.(\w+)$", key)
    if m:
        return f"layer1_{m.group(1)}/c{m.group(2)}/bn", m.group(3)
    m = re.match(r"^layer1\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        return f"layer1_{m.group(1)}/down/conv", "conv"
    m = re.match(r"^layer1\.(\d+)\.downsample\.1\.(\w+)$", key)
    if m:
        return f"layer1_{m.group(1)}/down/bn", m.group(2)
    # transitions: existing branch = Sequential(conv, bn, relu); new branch
    # = Sequential(Sequential(conv, bn, relu)) (hrnet.py:310-343)
    m = re.match(r"^transition(\d)\.(\d)\.0\.0\.weight$", key)
    if m:
        return f"trans{int(m.group(1)) - 1}_{m.group(2)}/conv", "conv"
    m = re.match(r"^transition(\d)\.(\d)\.0\.1\.(\w+)$", key)
    if m:
        return f"trans{int(m.group(1)) - 1}_{m.group(2)}/bn", m.group(3)
    m = re.match(r"^transition(\d)\.(\d)\.0\.weight$", key)
    if m:
        return f"trans{int(m.group(1)) - 1}_{m.group(2)}/conv", "conv"
    m = re.match(r"^transition(\d)\.(\d)\.1\.(\w+)$", key)
    if m:
        return f"trans{int(m.group(1)) - 1}_{m.group(2)}/bn", m.group(3)
    # stage modules: branches + fuse layers
    m = re.match(r"^stage(\d)\.(\d+)\.branches\.(\d)\.(\d+)\."
                 r"conv(\d)\.weight$", key)
    if m:
        return (f"stage{m.group(1)}_{m.group(2)}/branch{m.group(3)}_"
                f"{m.group(4)}/c{m.group(5)}/conv"), "conv"
    m = re.match(r"^stage(\d)\.(\d+)\.branches\.(\d)\.(\d+)\."
                 r"bn(\d)\.(\w+)$", key)
    if m:
        return (f"stage{m.group(1)}_{m.group(2)}/branch{m.group(3)}_"
                f"{m.group(4)}/c{m.group(5)}/bn"), m.group(6)
    m = re.match(r"^stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(\d)\."
                 r"0\.weight$", key)
    if m:  # j < i downsample chain step k
        return (f"stage{m.group(1)}_{m.group(2)}/fuse{m.group(3)}_"
                f"{m.group(4)}/d{m.group(5)}/conv"), "conv"
    m = re.match(r"^stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(\d)\."
                 r"1\.(\w+)$", key)
    if m:
        return (f"stage{m.group(1)}_{m.group(2)}/fuse{m.group(3)}_"
                f"{m.group(4)}/d{m.group(5)}/bn"), m.group(6)
    m = re.match(r"^stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.0\.weight$",
                 key)
    if m:  # j > i: 1x1 conv + bn
        return (f"stage{m.group(1)}_{m.group(2)}/fuse{m.group(3)}_"
                f"{m.group(4)}/conv"), "conv"
    m = re.match(r"^stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.1\.(\w+)$",
                 key)
    if m:
        return (f"stage{m.group(1)}_{m.group(2)}/fuse{m.group(3)}_"
                f"{m.group(4)}/bn"), m.group(5)
    return None


def convert_hrnet_encoder(state_dict, strict=False):
    """hrnetv2 encoder state_dict -> flax variables (classification-head
    leftovers skipped; strict=False by default)."""
    return _convert(state_dict, _translate_hrnet_key, strict)[0]


def _translate_csail_mobilenet_key(key: str):
    """anomaly/models/mobilenet.py keys -> MobileNetV2Dilated flax paths.

    features.0 = conv_bn stem (.0 conv, .1 bn); features.N (N=1..17)
    InvertedResidual with Sequential indices: expand blocks
    (0 pw-conv, 1 bn, 3 dw-conv, 4 bn, 6 project-conv, 7 bn); the t=1 block
    (features.1): (0 dw-conv, 1 bn, 3 project-conv, 4 bn). The final 1x1
    conv (features.18) is dropped by MobileNetV2Dilated.
    """
    m = re.match(r"^features\.0\.0\.weight$", key)
    if m:
        return "net/stem/cb/conv", "conv"
    m = re.match(r"^features\.0\.1\.(\w+)$", key)
    if m:
        return "net/stem/cb/bn", m.group(1)
    m = re.match(r"^features\.(\d+)\.conv\.(\d)\.(\w+)$", key)
    if m is None:
        return None
    block = int(m.group(1))
    if block >= 18:
        return None  # dropped final conv
    idx, leaf = int(m.group(2)), m.group(3)
    if block == 1:
        table = {0: ("dw/cb/conv", True), 1: ("dw/cb/bn", False),
                 3: ("project/conv", True), 4: ("project/bn", False)}
    else:
        table = {0: ("expand/cb/conv", True), 1: ("expand/cb/bn", False),
                 3: ("dw/cb/conv", True), 4: ("dw/cb/bn", False),
                 6: ("project/conv", True), 7: ("project/bn", False)}
    if idx not in table:
        return None
    sub, is_conv = table[idx]
    return f"net/block{block}/{sub}", ("conv" if is_conv else leaf)


def convert_csail_mobilenet_encoder(state_dict, strict=True):
    return _convert(state_dict, _translate_csail_mobilenet_key, strict)[0]


def _translate_mobilenet_key(key: str):
    """DeepLab MobileNetV2 backbone keys (network/modeling.py:44-68:
    features[0:4] -> low_level_features, features[4:-1] ->
    high_level_features, renumbered from 0)."""
    m = re.match(r"^low_level_features\.0\.0\.weight$", key)
    if m:
        return "net/stem/cb/conv", "conv"
    m = re.match(r"^low_level_features\.0\.1\.(\w+)$", key)
    if m:
        return "net/stem/cb/bn", m.group(1)

    m = re.match(r"^(low|high)_level_features\.(\d+)\.conv\.(.+)$", key)
    if m is None:
        return None
    # nn.Sequential slicing (features[0:4] / features[4:-1],
    # modeling.py:53-54) preserves the original child indices
    block = int(m.group(2))
    rest = m.group(3)
    prefix = f"net/block{block}"
    # block1 is the expand_ratio==1 block (no pw expand layer)
    if block == 1:
        table = {
            r"^0\.0\.weight$": ("dw/cb/conv", "conv"),
            r"^0\.1\.(\w+)$": ("dw/cb/bn", None),
            r"^1\.weight$": ("project/conv", "conv"),
            r"^2\.(\w+)$": ("project/bn", None),
        }
    else:
        table = {
            r"^0\.0\.weight$": ("expand/cb/conv", "conv"),
            r"^0\.1\.(\w+)$": ("expand/cb/bn", None),
            r"^1\.0\.weight$": ("dw/cb/conv", "conv"),
            r"^1\.1\.(\w+)$": ("dw/cb/bn", None),
            r"^2\.weight$": ("project/conv", "conv"),
            r"^3\.(\w+)$": ("project/bn", None),
        }
    for pat, (sub, kind) in table.items():
        mm = re.match(pat, rest)
        if mm:
            return f"{prefix}/{sub}", kind or mm.group(1)
    return None


def _translate_mobilenet_model_key(key: str):
    if key.startswith("backbone."):
        sub = _translate_mobilenet_key(key[len("backbone."):])
        if sub is None:
            return None
        return "backbone/" + sub[0], sub[1]
    if key.startswith("classifier."):
        sub = _translate_deeplab_head_key(key[len("classifier."):])
        if sub is None:
            return None
        return "head/" + sub[0], sub[1]
    return None


def convert_mobilenet_deeplab_checkpoint(ckpt, strict=True):
    """deeplabv3(plus)_mobilenet checkpoint -> flax variables."""
    state = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    return _convert(state, _translate_mobilenet_model_key, strict)[0]


def load_torch_checkpoint(path: str):
    """Load a .pth file on CPU without importing the reference code."""
    import torch

    obj = torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model_state" in obj:
        # DeepLab checkpoint dict {cur_itrs, model_state, optimizer_state,
        # ...} (main.py:315-325) — the weights live under model_state
        obj = obj["model_state"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
