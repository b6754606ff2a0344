"""The standalone ref-sweep suite must equal the reference's own YAMLs.

scripts/ref_sweep.py synthesizes the reference's 6 published experiments
(gamma sweep + num_bins sweep, reference main_test.py:279-283) from the
in-repo flagship config when the reference checkout is absent; this test
proves the synthesized configs are field-for-field identical to loading
the reference YAMLs, modulo three fields that are inert for these runs:
``experiment_name`` (a label), ``env_real`` (the EnvironmentReal
passthrough, unused when ``realness: False``), and ``env.load_file_pos``
(only read when ``load_positions`` is True, which these configs never
set).
"""

import dataclasses
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from ref_sweep import REF_CONFIG_DIR, SUITE, load_suite  # noqa: E402


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference checkout absent")
def test_synthesized_suite_equals_reference_yamls(monkeypatch):
    from diral_tpu.config import load_config

    # force the standalone (synthesis) path
    import ref_sweep as rs

    monkeypatch.setattr(rs, "REF_CONFIG_DIR", "/nonexistent")
    synthesized = dict(rs.load_suite())

    assert set(synthesized) == {name for name, _, _ in SUITE}
    for name, gamma, bins in SUITE:
        path = os.path.join(REF_CONFIG_DIR,
                            f"config_toy_4ue_3r_tests_db_{name}.yaml")
        ref = load_config(path)
        syn = synthesized[name]
        # normalize the three inert fields
        ref = dataclasses.replace(
            ref, experiment_name="", env_real={},
            env=dataclasses.replace(ref.env, load_file_pos=" "))
        syn = dataclasses.replace(
            syn, experiment_name="", env_real={},
            env=dataclasses.replace(syn.env, load_file_pos=" "))
        assert ref == syn, name
        assert syn.agent.gamma == gamma and syn.env.state.num_bins == bins
        # the inert fields really are inert on these runs
        assert not load_config(path).realness
        assert not load_config(path).env.load_positions


def test_suite_loads_with_reference_present():
    suite = load_suite()
    assert len(suite) == 6
    assert {c.agent.gamma for _, c in suite} == {0.3, 0.5, 0.7, 0.95}
    assert {c.env.state.num_bins for _, c in suite} == {10, 20, 40}
