"""Guards for the driver-sample ordering contract (verification.py):
the driver verifies only the FIRST 50 queries() entries per round, so
ordering mistakes silently cost verification coverage."""

from __future__ import annotations

from travel_data_pipeline_spark import registry, verification


def test_priority_head_names_all_registered():
    """A typo'd PRIORITY_HEAD name is silently skipped by
    ordered_names — fail loudly instead."""
    missing = [n for n in verification.PRIORITY_HEAD
               if n not in registry.QUERIES]
    assert not missing, f"PRIORITY_HEAD names not in registry: {missing}"


def test_green_names_all_registered():
    stale = sorted(verification.GREEN - set(registry.QUERIES))
    assert not stale, f"GREEN contains unregistered names: {stale}"


def test_ordered_names_is_permutation():
    names = list(registry.QUERIES)
    ordered = verification.ordered_names(names)
    assert sorted(ordered) == sorted(names)
    assert len(set(ordered)) == len(ordered)


def test_sample_maximally_packed_with_never_green():
    """Round-4 policy: the driver's 50-query window must be packed with
    never-green names — a green query may hold a slot only while no
    unverified one waits outside (overflow beyond 50 drains next
    round via ordered_names' never-green-first tail ordering)."""
    ordered = verification.ordered_names(list(registry.QUERIES))
    sample = set(ordered[:50])
    never_green = {n for n in registry.QUERIES
                   if n not in verification.GREEN}
    in_sample = never_green & sample
    assert len(in_sample) == min(50, len(never_green)), (
        f"sample holds {len(in_sample)} unverified queries but "
        f"{len(never_green)} exist — green slots are wasting coverage")


def test_unverified_fill_the_sample_before_green():
    """No already-green query may occupy a sample slot while an
    unverified one waits outside."""
    ordered = verification.ordered_names(list(registry.QUERIES))
    sample, rest = ordered[:50], ordered[50:]
    greens_in_sample = [n for n in sample if n in verification.GREEN]
    unverified_outside = [n for n in rest if n not in verification.GREEN]
    # greens are allowed in the sample only as deliberate re-proofs
    # (PRIORITY_HEAD members); anything else is a wasted slot
    wasted = [n for n in greens_in_sample
              if n not in verification.PRIORITY_HEAD]
    assert not (wasted and unverified_outside), (
        f"wasted sample slots {wasted} while {len(unverified_outside)} "
        "unverified queries wait outside")
