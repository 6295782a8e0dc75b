"""Driver entry points: the multichip dryrun must compile and run on the virtual
8-device CPU mesh (entry() at full 256^2 scale is compile-checked by the driver on
real hardware; here we shape-check it abstractly)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_8(eight_devices):
    __graft_entry__.dryrun_multichip(8)


def test_entry_shapes_abstract():
    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    blended, threshold = out
    assert blended.shape == (4, 256, 256, 3)
    assert threshold.shape == (4, 256, 256, 1)
