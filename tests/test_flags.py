"""Validated dataflow env flags (core/flags.py) — ADVICE r4 items.

Previously any value other than the exact opt-out string silently
selected the default-on branch (e.g. ``OWSS_DILATED_IMPL=off`` ENABLED
the shift path). dataflow_flag warns once and falls back to the default
for anything outside the allowed set.
"""

import warnings

import pytest

from open_world_semantic_segmentation_tpu.core.flags import (
    KNOWN_FLAGS,
    dataflow_flag,
)


@pytest.mark.parametrize("name", sorted(KNOWN_FLAGS))
def test_unset_returns_default(name, monkeypatch):
    monkeypatch.delenv(name, raising=False)
    assert dataflow_flag(name) == KNOWN_FLAGS[name][0]


@pytest.mark.parametrize("name", sorted(KNOWN_FLAGS))
def test_allowed_values_pass_through(name, monkeypatch):
    for val in KNOWN_FLAGS[name][1]:
        monkeypatch.setenv(name, val)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert dataflow_flag(name) == val


def test_unexpected_value_warns_and_falls_back(monkeypatch):
    import open_world_semantic_segmentation_tpu.core.flags as flags

    monkeypatch.setenv("OWSS_DILATED_IMPL", "off")
    monkeypatch.setattr(flags, "_WARNED", set())
    with pytest.warns(UserWarning, match="OWSS_DILATED_IMPL='off'"):
        assert dataflow_flag("OWSS_DILATED_IMPL") == "shift"
    # warned once: second read is silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert dataflow_flag("OWSS_DILATED_IMPL") == "shift"


def test_typo_disable_no_longer_enables_shift(monkeypatch):
    """A user typing a plausible disable spelling gets a warning, not the
    opposite behavior — and =native still disables the shift path at the
    ConvBN level."""
    import jax.numpy as jnp
    import numpy as np

    from open_world_semantic_segmentation_tpu.models.layers import ConvBN
    import open_world_semantic_segmentation_tpu.core.flags as flags

    conv = ConvBN(4, (3, 3), padding=6, dilation=(6, 6))
    pad = ((6, 6), (6, 6))
    bound = conv.bind({"params": {}})  # _use_shift_dilated reads no params

    monkeypatch.setenv("OWSS_DILATED_IMPL", "native")
    assert bound._use_shift_dilated(pad) is False
    monkeypatch.setenv("OWSS_DILATED_IMPL", "shift")
    assert bound._use_shift_dilated(pad) is True
    # typo: falls back to the default (shift) but WARNS instead of
    # silently flipping semantics
    monkeypatch.setenv("OWSS_DILATED_IMPL", "Native")
    monkeypatch.setattr(flags, "_WARNED", set())
    with pytest.warns(UserWarning):
        assert bound._use_shift_dilated(pad) is True
    del np, jnp
