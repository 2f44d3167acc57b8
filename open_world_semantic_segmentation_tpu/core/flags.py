"""Dataflow-selection environment flags (validated, trace-time).

Every ``OWSS_*`` dataflow flag selects between numerically-equivalent
formulations of the same computation (concat vs projection-sum ASPP,
native vs shift+matmul dilated convs, gather vs matmul resize, ...).
They exist for A/B perf runs; defaults are the fastest measured
dataflow (docs/DESIGN.md).

**Trace-time semantics.** Flags are read while a module is being
TRACED, i.e. during the first call of each ``jax.jit``-compiled
program. Flipping an env var afterwards does NOT change
already-compiled programs — the cached executable keeps the dataflow it
was traced with. Set flags before the first model call (the bench/CLI
tools do this via ``os.environ`` before building the model).

**Validation.** An unrecognized value (a typo, ``"off"``, ``"0"``, ...)
previously selected whichever branch the inequality happened to pick —
e.g. ``OWSS_DILATED_IMPL=off`` silently ENABLED the shift path. Now any
value outside the flag's allowed set warns once and falls back to the
default.
"""

from __future__ import annotations

import os
import warnings

_WARNED = set()

# flag name -> (default, allowed values)
KNOWN_FLAGS = {
    # models/layers.py ConvBN._use_shift_dilated (ops/dilated.py)
    "OWSS_DILATED_IMPL": ("shift", ("shift", "native")),
    # models/deeplab.py ASPP: projection-sum vs materialized 1280-ch concat
    "OWSS_ASPP_PROJECT": ("sum", ("sum", "concat")),
    # models/decoders.py PPMDeepsup: concat-free PPMFuse vs concat+ConvBN;
    # "force" keeps the fuse dataflow even under classic int8
    "OWSS_PPM_FUSE": ("fuse", ("fuse", "concat", "force")),
    # ops/resize.py: gather-based interp vs interpolation-matmul (MXU)
    "OWSS_RESIZE_IMPL": ("interp", ("interp", "mxu")),
    # models/layers.py ConvBN: stride-2 image-stem conv as 2x2
    # space-to-depth + stride-1 conv (ops/stem.py) vs XLA's native
    # phase-split lowering. NEGATIVE probe (docs/DESIGN.md round-5): the
    # explicit s2d transpose costs what the phase-split copies cost —
    # 58.1 vs 59.1 imgs/sec e2e on the 1024x2048 DeepLab eval — so the
    # native lowering stays the default; the formulation is kept for A/B
    # runs and exactness-tested (tests/test_ops.py)
    "OWSS_STEM_IMPL": ("native", ("s2d", "native")),
    # models/resnet.py: optimization_barrier around the stem — probe flag
    # for the in-program stem-fusion slowdown (docs/DESIGN.md round-4
    # DeepLab audit residual); "conv" barriers the stem conv output,
    # "pool" the maxpool output, "both" both
    "OWSS_STEM_BARRIER": ("off", ("off", "conv", "pool", "both")),
}


def dataflow_flag(name: str) -> str:
    """Read ``name`` from the environment, validated against KNOWN_FLAGS.

    Returns the default when unset; warns once per (name, value) and
    returns the default when the value is not in the allowed set.
    """
    default, allowed = KNOWN_FLAGS[name]
    val = os.environ.get(name)
    if val is None or val == default:
        return default
    if val not in allowed:
        key = (name, val)
        if key not in _WARNED:
            _WARNED.add(key)
            warnings.warn(
                f"{name}={val!r} is not one of {list(allowed)}; "
                f"using the default {default!r}. (Flags are read at "
                f"trace time — set them before the first jit call.)",
                stacklevel=2,
            )
        return default
    return val
