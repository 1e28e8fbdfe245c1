"""E7 chain-id detection (SURVEY §2 E7; reference lib/meeseeker.rb:53-76).

Mirrors the reference's prefix table: modern Hive id → hive, legacy
all-zero id under the HIVE_ key → hive, Steem id → steem, unknown chain →
lowercased guess from the first *_CHAIN_ID key (with a warning), no
chain-id key at all → error.
"""

from __future__ import annotations

import pytest

from meeseeker_spark import chain as C


def test_modern_hive_id():
    assert C.chain_key_prefix({"HIVE_CHAIN_ID": C.HIVE_CHAIN_ID}) == "hive"


def test_legacy_hive_id_maps_to_hive():
    # pre-fork node: all-zero id reported under the HIVE_ key → still hive
    # (meeseeker.rb:66-67); the key NAME decides, not the zero value
    assert C.chain_key_prefix(
        {"HIVE_CHAIN_ID": C.HIVE_LEGACY_CHAIN_ID}) == "hive"


def test_steem_id():
    assert C.chain_key_prefix({"STEEM_CHAIN_ID": C.STEEM_CHAIN_ID}) == "steem"


def test_hive_key_wins_over_steem_key():
    # evaluation order parity: a config reporting both resolves hive first
    cfg = {"HIVE_CHAIN_ID": C.HIVE_CHAIN_ID,
           "STEEM_CHAIN_ID": C.STEEM_CHAIN_ID}
    assert C.chain_key_prefix(cfg) == "hive"


def test_unknown_chain_guesses_from_key_and_warns():
    cfg = {"WHATEVER_CHAIN_ID": "ab" * 32, "OTHER_SETTING": 1}
    with pytest.warns(UserWarning, match="Guessing chain_key_prefix"):
        assert C.chain_key_prefix(cfg) == "whatever"


def test_unknown_value_under_hive_key_falls_through_to_guess():
    # HIVE_CHAIN_ID present but matching neither known id → the reference
    # falls to the guess branch, which finds the same key and yields 'hive'
    cfg = {"HIVE_CHAIN_ID": "ff" * 32}
    with pytest.warns(UserWarning):
        assert C.chain_key_prefix(cfg) == "hive"


def test_falsy_values_treated_as_absent():
    # !!config.HIVE_CHAIN_ID semantics: empty string is absent
    cfg = {"HIVE_CHAIN_ID": "", "STEEM_CHAIN_ID": C.STEEM_CHAIN_ID}
    assert C.chain_key_prefix(cfg) == "steem"


def test_no_chain_id_key_raises():
    with pytest.raises(ValueError):
        C.chain_key_prefix({"SOMETHING_ELSE": "x"})
