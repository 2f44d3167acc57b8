"""Space-to-depth reparameterization of the stride-2 image-stem conv.

Both reference stems start with a stride-2 convolution over the 3-channel
image (`anomaly/lib/models/resnet.py` deep stem: 3x3/2;
`DeepLabV3Plus-Pytorch/network/backbone/resnet.py` torchvision stem:
7x7/2).  On TPU, XLA lowers a stride-2 conv with Cin=3 through a
phase-split strategy that pads W, reshapes it into 8 column phases, and
pays two large relayout copies around the conv fusion — in the compiled
1024x2048 DeepLab program those copies + the conv cost ~2.6 ms/img
against a ~1.0 ms isolated floor (docs/DESIGN.md round-4 audit residual).

The candidate fix (opt-in via ``OWSS_STEM_IMPL=s2d``; a NEGATIVE probe,
kept for A/B runs — it e2e-TIES the native lowering at 58.1 vs 59.1
imgs/sec because the explicit space-to-depth transpose pays the same
relayout the phase-split copies paid; reorganizing 3-channel HWC image
data is lane-starved whichever formulation feeds the MXU): fold the
stride into the data ONCE with a 2x2 space-to-depth, turning the conv
into a stride-1 conv over 4*Cin channels:

    out[i,j,o] = sum_{a,b,c} xpad[2i+a, 2j+b, c] * K[a,b,c,o]
               = sum_{alpha,beta,rho,sigma,c}
                   z[i+alpha, j+beta, (rho,sigma,c)] * K[2alpha+rho,
                                                         2beta+sigma, c, o]

with z[m,n,(rho,sigma,c)] = xpad[2m+rho, 2n+sigma, c].  The kernel remap
is a zero-pad + reshape of the SAME `conv/kernel` parameter (7x7 ->
4x4x(4*Cin), 3x3 -> 2x2x(4*Cin)), so checkpoints and converters are
untouched; the math is the same sum re-associated (exactness asserted in
tests/test_ops.py).  Stride-1 convs take XLA's ordinary spatial tiling —
no phase split, no relayout copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth_kernel(kernel: jax.Array) -> jax.Array:
    """Remap an HWIO stride-2 kernel to its 2x2-space-to-depth form.

    [kh, kw, cin, cout] -> [ceil(kh/2), ceil(kw/2), 4*cin, cout] with the
    depth axis ordered (row-phase, col-phase, cin) to match
    :func:`conv_stride2_s2d`'s data transform. Odd kernel extents are
    zero-padded at the bottom/right (those taps do not exist).
    """
    kh, kw, cin, cout = kernel.shape
    ka, kb = (kh + 1) // 2, (kw + 1) // 2
    kp = jnp.pad(kernel, ((0, 2 * ka - kh), (0, 2 * kb - kw),
                          (0, 0), (0, 0)))
    return kp.reshape(ka, 2, kb, 2, cin, cout) \
             .transpose(0, 2, 1, 3, 4, 5) \
             .reshape(ka, kb, 4 * cin, cout)


def conv_stride2_s2d(x: jax.Array, kernel: jax.Array, padding: int,
                     preferred_element_type=None) -> jax.Array:
    """Stride-2 'SAME-ish' conv (torch int padding) via space-to-depth.

    Exact reassociation of
    ``lax.conv_general_dilated(x, kernel, (2,2), ((p,p),(p,p)))`` for
    NHWC ``x`` with even H, W and odd kernel extents — the image-stem
    case. The input is padded, 2x2 space-to-depth'd ([N,H',W',4*Cin]),
    and convolved at stride 1 with the remapped kernel.
    """
    kh, kw, cin, cout = kernel.shape
    p = int(padding)
    n, h, w, c = x.shape
    if c != cin or h % 2 or w % 2:
        raise ValueError(f"conv_stride2_s2d: got x {x.shape}, "
                         f"kernel {kernel.shape} (need even H/W)")
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    hp, wp = h + 2 * p, w + 2 * p
    # 2p is even, H/W even -> hp/wp even; phases (rho, sigma) split cleanly
    z = xp.reshape(n, hp // 2, 2, wp // 2, 2, c) \
          .transpose(0, 1, 3, 2, 4, 5) \
          .reshape(n, hp // 2, wp // 2, 4 * c)
    k4 = space_to_depth_kernel(kernel)
    return jax.lax.conv_general_dilated(
        z, k4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)
