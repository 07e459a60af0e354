"""Rehearsal must assert something (VERDICT r4 next #3).

Two layers of protection:
* unit: the trained-rehearsal assertion logic rejects vacuous reports
  (0.0 accuracies / null preservation / inverted routing) — guarded by
  driving ``scripts/real_smoke.py`` assertion arithmetic directly;
* artifact: the committed REHEARSAL_r05.json (produced by
  ``real_smoke.py --rehearse``) must carry nonzero accuracies, a
  preservation number, and passing self-assertions. Skipped when the
  artifact has not been produced yet.
"""

import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


class TestRehearsalArtifact:
    @pytest.fixture(scope="class")
    def artifact(self):
        p = ROOT / "REHEARSAL_r05.json"
        if not p.exists():
            pytest.skip("REHEARSAL_r05.json not produced yet")
        return json.loads(p.read_text())

    def test_mode_is_trained(self, artifact):
        assert artifact["mode"] == "trained-rehearsal"

    def test_nonzero_accuracies(self, artifact):
        a = artifact["assertions"]
        assert a["cascade_accuracy"] > 0
        assert a["fixed_largest_accuracy"] > 0

    def test_preservation_computable(self, artifact):
        assert artifact["assertions"]["quality_preservation"] is not None
        assert artifact["assertions"]["quality_preservation"] >= 0.5

    def test_routing_not_inverted(self, artifact):
        assert artifact["assertions"]["top_tier_share"] <= 0.5

    def test_self_assertions_passed(self, artifact):
        assert artifact["assertions"]["passed"] is True
        assert artifact["assertions"]["failures"] == []


def test_random_rehearsal_mode_makes_no_quality_claim():
    """The legacy random-checkpoint mode must label itself 'rehearsal'
    (plumbing smoke) and never 'trained-rehearsal' — its quality columns
    are vacuous by construction and must not carry assertions."""
    src = (ROOT / "scripts" / "real_smoke.py").read_text()
    assert '"rehearsal" if args.rehearse_random' in src
    assert "trained-rehearsal" in src
