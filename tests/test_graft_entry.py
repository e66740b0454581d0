"""Driver-contract entry points (VERDICT r1 missing #1).

The round-1 driver record failed because its harness initializes JAX
(axon, 1 chip) before calling ``dryrun_multichip`` — the env-var route
to a virtual CPU mesh is then closed. The fix re-execs the dryrun in a
fresh subprocess; these tests pin that recovery path.
"""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from __graft_entry__ import dryrun_multichip  # noqa: E402


def test_dryrun_fallback_when_devices_insufficient(capfd):
    """The pytest process holds an initialized 8-device CPU backend, so
    asking for 16 devices cannot be satisfied in-process — exactly the
    driver's failure mode (backends initialized, too few devices). The
    subprocess fallback must provision a fresh 16-device CPU mesh and
    succeed."""
    assert len(jax.devices()) == 8  # precondition: backend initialized
    dryrun_multichip(16)
    out, _ = capfd.readouterr()
    assert "dryrun_multichip(16): ok" in out


def test_dryrun_in_process_when_devices_suffice(capfd):
    """With enough live devices the dryrun runs in-process (no child)."""
    dryrun_multichip(8)
    out, _ = capfd.readouterr()
    assert "dryrun_multichip(8): ok" in out
