"""Scene-parsing decoders: C1, PPM (pyramid pooling), UPerNet, and the DML
embedding variant.

Parity targets (anomaly/models/models.py):
- C1 / C1DeepSup          :440-462 / :404-436
- PPM / PPMDeepsup        :466-511 / :515-584
- PPMDeepsup_embedding    :586-687  (distance head vs fixed one-hot centers)
- UPerNet                 :690-777

Behavioral notes reproduced here:
- At inference C1/PPM/UPerNet apply softmax after upsampling; PPMDeepsup and
  PPMDeepsup_embedding do NOT (models.py:562, 662 are commented out) — the
  OOD scoring math depends on receiving raw (distance) logits.
- The embedding decoder's ``ft`` output at inference is the *pre-distance*
  K-dim conv map upsampled to seg_size (models.py:667-669), while PPMDeepsup
  returns the 4096-d PPM concat un-upsampled (models.py:555, 564-567).
- The deep-supervision branch parameters exist and run, but the reference's
  shipped loss never backprops through them (models.py:79-81 commented);
  training code treats deepsup as optional via config.

Decoders return a dict: {"scores", optional "deepsup", optional "ft"}.
When ``seg_size`` is given, scores (and embedding ``ft``) are bilinearly
upsampled (torch align_corners=False parity).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.flags import dataflow_flag
from .layers import BNConfig, Conv, ConvBN, kaiming_normal
from ..ops.pool import adaptive_avg_pool
from ..ops.ppm_fuse import ppm_fuse_conv
from ..ops.resize import bilinear_resize
from ..ops.distance import one_hot_center_logits

# ModelBuilder.weights_init (models.py:124-131): decoder convs use
# kaiming_normal (fan_in); decoder BN weight=1, bias=1e-4.
DECODER_BN = BNConfig(bias_init=nn.initializers.constant(1e-4))


def _maybe_upsample(x, seg_size):
    if seg_size is None:
        return x
    return bilinear_resize(x, seg_size)


class C1(nn.Module):
    """Single 3x3 conv-bn-relu + 1x1 classifier (models.py:440-462)."""

    num_class: int = 150
    fc_dim: int = 2048
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        x = ConvBN(self.fc_dim // 4, (3, 3), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype,
                   conv_init=kaiming_normal, name="cbr")(conv_out[-1])
        x = Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                 dtype=self.dtype, name="conv_last")(x)
        x = _maybe_upsample(x, seg_size)
        if self.use_softmax and seg_size is not None:
            x = nn.softmax(x, axis=-1)
        return {"scores": x}


class C1DeepSup(nn.Module):
    """C1 plus a deep-supervision branch off conv4 (models.py:404-436)."""

    num_class: int = 150
    fc_dim: int = 2048
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        x = ConvBN(self.fc_dim // 4, (3, 3), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype,
                   conv_init=kaiming_normal, name="cbr")(conv_out[-1])
        x = Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                 dtype=self.dtype, name="conv_last")(x)
        if self.use_softmax and seg_size is not None:
            return {"scores": nn.softmax(_maybe_upsample(x, seg_size), axis=-1)}
        ds = ConvBN(self.fc_dim // 4, (3, 3), padding=1, bn=self.bn,
                    train=self.train, dtype=self.dtype,
                    conv_init=kaiming_normal, name="cbr_deepsup")(conv_out[-2])
        ds = Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                  dtype=self.dtype, name="conv_last_deepsup")(ds)
        return {"scores": _maybe_upsample(x, seg_size), "deepsup": ds}


class _PPMTrunk(nn.Module):
    """Pyramid pooling branches: (pool -> 1x1 conv-bn-relu) per scale.

    Returns the pooled maps at their PYRAMID resolutions (k x k); the
    upsample-to-conv5-size + concat of the reference (models.py:543-556)
    is deferred to the consumer — `_PPMHead` folds it into the fuse conv
    algebraically (ops/ppm_fuse.py) and `_ppm_concat` materializes it for
    the paths that need the literal 4096-d tensor (`ft`, int8 quant)."""

    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, conv5):
        pools = []
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(conv5, scale)
            p = ConvBN(512, (1, 1), bn=self.bn, train=self.train,
                       dtype=self.dtype, conv_init=kaiming_normal,
                       quant=self.quant, name=f"ppm{i}")(p)
            pools.append(p)
        return pools


def _ppm_concat(conv5, pools):
    """Materialized reference dataflow: cat(conv5, upsampled pools)."""
    size = conv5.shape[-3:-1]
    return jnp.concatenate(
        [conv5] + [bilinear_resize(p, size) for p in pools], axis=-1)


class PPMFuse(nn.Module):
    """The fuse conv-bn-relu computed WITHOUT materializing the concat.

    Parameter tree is identical to ``ConvBN(512, (3, 3), name="fuse")``
    (params ``conv/kernel`` + ``bn/...``) so checkpoints, the converter,
    and every quant tool see the same structure; only the dataflow
    differs (ops/ppm_fuse.py: the pooled branches' contribution is
    computed at pyramid resolution via shifted interpolation matmuls).

    Under ``int8-hybrid`` a prequantized tree stores this kernel as int8
    with its per-output-channel ``w_scale``; the dequantization is exact
    and free — the scale commutes with the conv's in-channel/spatial
    reduction, so it is applied to the conv OUTPUT and the kernel stays
    1-byte in HBM."""

    features: int = 512
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN

    @nn.compact
    def __call__(self, conv5, pools):
        cin = conv5.shape[-1] + sum(p.shape[-1] for p in pools)
        kernel = self.variable(
            "params", "conv",
            lambda: {"kernel": kaiming_normal(
                self.make_rng("params"), (3, 3, cin, self.features),
                jnp.float32)},
        ).value["kernel"]
        y = ppm_fuse_conv(conv5, pools, kernel, dtype=self.dtype)
        if kernel.dtype == jnp.int8:
            s_w = self.variable(
                "quant", "w_scale",
                lambda: jnp.ones((self.features,), jnp.float32)).value
            y = y * s_w
        y = self.bn.make(not self.train, dtype=self.dtype,
                         name="bn")(y.astype(self.dtype))
        return nn.relu(y)


class _PPMHead(nn.Module):
    """conv_last: 3x3 conv-bn-relu -> dropout(0.1) -> 1x1 to num_class."""

    num_class: int
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, conv5, pools):
        # the fuse conv is the single largest matmul in the model (fc_dim
        # 4096 -> 512 3x3); the final 1x1 classifier stays in the compute
        # dtype — score/distance-logit precision feeds the OOD metrics.
        # Default dataflow is the concat-free formulation (PPMFuse); the
        # classic int8 path (and OWSS_PPM_FUSE=concat for A/B runs) keeps
        # the materialized concat + plain ConvBN. "int8-hybrid" is the
        # fastest measured policy (docs/DESIGN.md round 3): int8 backbone
        # + PPM branches, concat-free fuse (int8 weights dequantized
        # exactly via the post-conv w_scale; activations bf16).
        # OWSS_PPM_FUSE=force keeps the old env-var spelling of the same
        # split for A/B runs. Read at TRACE time, validated — see
        # core/flags.py.
        impl = dataflow_flag("OWSS_PPM_FUSE")
        if ((self.quant in ("off", "int8-hybrid") and impl != "concat")
                or impl == "force"):
            x = PPMFuse(512, self.train, self.dtype, self.bn,
                        name="fuse")(conv5, pools)
        else:
            x = ConvBN(512, (3, 3), padding=1, bn=self.bn, train=self.train,
                       dtype=self.dtype, conv_init=kaiming_normal,
                       quant=self.quant,
                       name="fuse")(_ppm_concat(conv5, pools))
        x = nn.Dropout(0.1, deterministic=not self.train, name="drop")(x)
        return Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                    dtype=self.dtype, name="out")(x)


class PPM(nn.Module):
    """models.py:466-511."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        conv5 = conv_out[-1]
        pools = _PPMTrunk(self.fc_dim, self.pool_scales, self.train,
                          self.dtype, self.bn, self.quant,
                          name="ppm")(conv5)
        x = _PPMHead(self.num_class, self.train, self.dtype, self.bn,
                     self.quant, name="conv_last")(conv5, pools)
        x = _maybe_upsample(x, seg_size)
        if self.use_softmax and seg_size is not None:
            x = nn.softmax(x, axis=-1)
        return {"scores": x}


class _DeepsupBranch(nn.Module):
    """cbr_deepsup + dropout + conv_last_deepsup off conv4."""

    num_class: int
    fc_dim: int
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN

    @nn.compact
    def __call__(self, conv4):
        ds = ConvBN(self.fc_dim // 4, (3, 3), padding=1, bn=self.bn,
                    train=self.train, dtype=self.dtype,
                    conv_init=kaiming_normal, name="cbr_deepsup")(conv4)
        ds = nn.Dropout(0.1, deterministic=not self.train,
                        name="dropout_deepsup")(ds)
        return Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                    dtype=self.dtype, name="conv_last_deepsup")(ds)


class PPMDeepsup(nn.Module):
    """models.py:515-584. Inference returns RAW logits (softmax commented out)
    plus the 4096-d PPM concat as ``ft`` (used by reconstruction scoring)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        conv5 = conv_out[-1]
        pools = _PPMTrunk(self.fc_dim, self.pool_scales, self.train,
                          self.dtype, self.bn, self.quant,
                          name="ppm")(conv5)
        x = _PPMHead(self.num_class, self.train, self.dtype, self.bn,
                     self.quant, name="conv_last")(conv5, pools)
        # ``ft`` is the literal 4096-d concat (rec scoring consumes it) —
        # the only consumer that still needs the materialized tensor
        if seg_size is not None:
            return {"scores": bilinear_resize(x, seg_size),
                    "ft": _ppm_concat(conv5, pools)}
        ds = _DeepsupBranch(self.num_class, self.fc_dim, self.train,
                            self.dtype, self.bn, name="deepsup")(conv_out[-2])
        return {"scores": x, "deepsup": ds,
                "ft": _ppm_concat(conv5, pools)}


class PPMDeepsupEmbedding(nn.Module):
    """models.py:586-687: PPMDeepsup trunk whose K-dim conv output is read as
    a pixel embedding; logits are -||x - m*e_k||^2 against fixed one-hot
    centers (magnitude 3). The distance head is computed algebraically
    (ops/distance.py) — the reference's B x HW x K x C broadcast tensor never
    exists. ``ft`` at inference is the pre-distance K-dim map upsampled to
    seg_size (models.py:667-669)."""

    num_class: int = 13
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    magnitude: float = 3.0
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        conv5 = conv_out[-1]
        pools = _PPMTrunk(self.fc_dim, self.pool_scales, self.train,
                          self.dtype, self.bn, self.quant,
                          name="ppm")(conv5)
        emb = _PPMHead(self.num_class, self.train, self.dtype, self.bn,
                       self.quant, name="conv_last")(conv5, pools)
        scores = one_hot_center_logits(emb, self.magnitude)
        if seg_size is not None:
            # flagship eval path: ``ft`` is the pre-distance K-dim map, so
            # the 4096-d concat never materializes at all here
            return {
                "scores": bilinear_resize(scores, seg_size),
                "ft": bilinear_resize(emb, seg_size),
            }
        ds = _DeepsupBranch(self.num_class, self.fc_dim, self.train,
                            self.dtype, self.bn, name="deepsup")(conv_out[-2])
        return {"scores": scores, "deepsup": ds,
                "ft": _ppm_concat(conv5, pools), "embedding": emb}


class UPerNet(nn.Module):
    """FPN + PPM decoder (models.py:690-777)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fpn_inplanes: Sequence[int] = (256, 512, 1024, 2048)
    fpn_dim: int = 256
    use_softmax: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = DECODER_BN

    @nn.compact
    def __call__(self, conv_out, seg_size=None):
        conv5 = conv_out[-1]
        size5 = conv5.shape[-3:-1]
        ppm_out = [conv5]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(conv5, scale)
            p = bilinear_resize(p, size5)
            p = ConvBN(512, (1, 1), bn=self.bn, train=self.train,
                       dtype=self.dtype, conv_init=kaiming_normal,
                       name=f"ppm_conv{i}")(p)
            ppm_out.append(p)
        f = ConvBN(self.fpn_dim, (3, 3), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype,
                   conv_init=kaiming_normal, name="ppm_last_conv")(
            jnp.concatenate(ppm_out, axis=-1))

        fpn_features = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lateral = ConvBN(self.fpn_dim, (1, 1), bn=self.bn,
                             train=self.train, dtype=self.dtype,
                             conv_init=kaiming_normal, name=f"fpn_in{i}")(
                conv_out[i])
            f = lateral + bilinear_resize(f, lateral.shape[-3:-1])
            out = ConvBN(self.fpn_dim, (3, 3), padding=1, bn=self.bn,
                         train=self.train, dtype=self.dtype,
                         conv_init=kaiming_normal, name=f"fpn_out{i}")(f)
            fpn_features.append(out)
        fpn_features.reverse()

        out_size = fpn_features[0].shape[-3:-1]
        fusion = [fpn_features[0]] + [
            bilinear_resize(p, out_size) for p in fpn_features[1:]]
        x = ConvBN(self.fpn_dim, (3, 3), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype,
                   conv_init=kaiming_normal, name="conv_fusion")(
            jnp.concatenate(fusion, axis=-1))
        x = Conv(self.num_class, (1, 1), conv_init=kaiming_normal,
                 dtype=self.dtype, name="conv_last")(x)
        x = _maybe_upsample(x, seg_size)
        if self.use_softmax and seg_size is not None:
            x = nn.softmax(x, axis=-1)
        return {"scores": x}
