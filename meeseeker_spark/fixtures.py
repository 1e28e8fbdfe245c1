"""Deterministic chain-shaped fixtures (FIXTURES.md §B).

Generates mainnet blocks (nested trx→ops), late virtual ops, sidechain
blocks (real + virtual trxs), witness schedules — plus *golden* expectations
computed by an independent pure-Python path (never Spark), mirroring the
reference's record shapes:

- block → {transactions, transaction_ids, witness, ...}
  (/root/reference/lib/meeseeker/block_follower_job.rb:60-76,161-167)
- virtual op → {trx_id: 40 zeros, op: [type, value]}
  (/root/reference/lib/meeseeker/block_follower_job.rb:214-221)
- sidechain trx → {transactionId, contract, action, refHiveBlockNumber}
  (/root/reference/lib/meeseeker/steem_engine/follower_job.rb:25-29)

Everything is seeded; same seed → byte-identical parquet.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import VIRTUAL_TRX_ID, WITNESS_ROUND

BASE_BLOCK = 29_861_068
BASE_TS = dt.datetime(2024, 3, 1, 0, 0, 0)
BLOCK_INTERVAL = dt.timedelta(seconds=3)

OP_TYPES = ["vote", "comment", "comment_options", "custom_json", "transfer",
            "claim_reward_balance"]
CUSTOM_JSON_IDS = ["follow", "sm_team_reveal", "notify"]
VOP_TYPES = ["producer_reward", "curation_reward", "author_reward",
             "fill_vesting_withdraw"]
CONTRACTS = {
    "tokens": ["transfer", "issue", "transferToContract"],
    "market": ["buy", "sell", "cancel"],
    "sscstore": ["buy"],
    "steempegged": ["buy", "withdraw"],
}
WITNESS_POOL = [f"witness{i:02d}" for i in range(25)]


def _hex40(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(40))


@dataclass
class Fixtures:
    blocks: list[dict] = field(default_factory=list)
    virtual_ops: list[dict] = field(default_factory=list)
    engine_blocks: list[dict] = field(default_factory=list)
    witness_schedules: list[dict] = field(default_factory=list)
    # golden (independent pure-python expectations)
    ops_expected: list[dict] = field(default_factory=list)
    engine_ops_expected: list[dict] = field(default_factory=list)
    trx_counts_expected: list[dict] = field(default_factory=list)
    channels_expected: list[dict] = field(default_factory=list)
    corrupted_round: int | None = None


def generate(n_blocks: int = 210, seed: int = 42, chain: str = "hive",
             engine_chain: str = "hive_engine") -> Fixtures:
    rng = random.Random(seed)
    fx = Fixtures()

    # witness schedule per 21-block round; witnesses assigned round-robin
    n_rounds = n_blocks // WITNESS_ROUND
    round_witnesses: dict[int, list[str]] = {}
    for r in range(n_rounds + 1):
        round_witnesses[r] = rng.sample(WITNESS_POOL, WITNESS_ROUND)

    for i in range(n_blocks):
        block_num = BASE_BLOCK + i
        ts = BASE_TS + i * BLOCK_INTERVAL
        r = i // WITNESS_ROUND
        witness = round_witnesses[r][i % WITNESS_ROUND]
        n_trx = rng.choice([0, 1, 2, 3, 3, 4, 5])
        trx_ids, transactions = [], []
        for t in range(n_trx):
            trx_id = _hex40(rng)
            trx_ids.append(trx_id)
            n_ops = rng.choice([1, 1, 1, 2, 2, 3])
            ops = []
            for o in range(n_ops):
                op_type = rng.choice(OP_TYPES)
                payload: dict = {"n": rng.randint(0, 10_000)}
                if op_type == "custom_json":
                    payload["id"] = rng.choice(CUSTOM_JSON_IDS + [""])
                value = json.dumps(payload, sort_keys=True)
                ops.append({"type": op_type + "_operation", "value": value})
                fx.ops_expected.append({
                    "chain": chain, "block_num": block_num, "trx_id": trx_id,
                    "trx_index": o, "op_type": op_type,
                    "transaction_num": t, "value": value,
                    "timestamp": ts,
                    "key": f"{chain}:{block_num}:{trx_id}:{o}:{op_type}",
                })
                fx.channels_expected.append(
                    {"channel": f"{chain}:op:{op_type}", "kind": "op"})
                if op_type == "custom_json" and payload["id"]:
                    fx.channels_expected.append(
                        {"channel": f"{chain}:op:custom_json:{payload['id']}",
                         "kind": "custom_id"})
            transactions.append({"operations": ops})
            fx.channels_expected.append(
                {"channel": f"{chain}:transaction", "kind": "transaction"})
        fx.blocks.append({
            "block_num": block_num,
            "previous": _hex40(rng),
            "timestamp": ts,
            "witness": witness,
            "transaction_merkle_root": _hex40(rng),
            "extensions": [],
            "transaction_ids": trx_ids,
            "transactions": transactions,
        })
        fx.channels_expected.append({"channel": f"{chain}:block", "kind": "block"})
        fx.trx_counts_expected.append(
            {"chain": chain, "block_num": block_num, "n_transactions": n_trx})

        # virtual ops: 1-2 per block, late by 0..18s (beyond-watermark cases >9)
        n_vops = rng.choice([1, 1, 2])
        for v in range(n_vops):
            vop_type = rng.choice(VOP_TYPES)
            value = json.dumps({"amount": rng.randint(1, 999)}, sort_keys=True)
            fx.virtual_ops.append({
                "block": block_num, "trx_id": VIRTUAL_TRX_ID, "vop_seq": v,
                "op": [vop_type, value], "timestamp": ts,
                "arrival_delay_s": rng.choice([0, 1, 3, 6, 9, 12, 18]),
            })
            fx.ops_expected.append({
                "chain": chain, "block_num": block_num,
                "trx_id": VIRTUAL_TRX_ID, "trx_index": v, "op_type": vop_type,
                "transaction_num": None, "value": value, "timestamp": ts,
                "key": f"{chain}:{block_num}:{VIRTUAL_TRX_ID}:{v}:{vop_type}",
            })
            fx.channels_expected.append(
                {"channel": f"{chain}:op:{vop_type}", "kind": "op"})

    # witness schedules (one per round), with ONE corrupted round for the
    # negative D4 test (swap a witness not in the round)
    fx.corrupted_round = n_rounds // 2
    for r in range(n_rounds):
        shuffled = list(round_witnesses[r])
        if r == fx.corrupted_round:
            outsider = next(w for w in WITNESS_POOL if w not in shuffled)
            shuffled[3] = outsider
        fx.witness_schedules.append({
            "id": r,
            "current_virtual_time": int("394786533297261211125967" + f"{r:03d}"),
            "next_shuffle_block_num": BASE_BLOCK + (r + 1) * WITNESS_ROUND - 1,
            "current_shuffled_witnesses": shuffled,
            "num_scheduled_witnesses": WITNESS_ROUND,
            "majority_version": "1.27.5",
            "median_props": {
                "account_creation_fee": {"amount": "3000", "precision": 3,
                                         "nai": "@@000000021"},
                "maximum_block_size": 65536,
                "sbd_interest_rate": 0,
            },
        })

    # sidechain blocks: ~1 per 3 mainnet blocks; ref block always a real
    # mainnet block (D3 referential invariant holds on clean fixtures)
    eng_block_num = 1_000_000
    for i in range(0, n_blocks, 3):
        ref_block = BASE_BLOCK + i
        ts = (BASE_TS + i * BLOCK_INTERVAL).strftime("%Y-%m-%dT%H:%M:%S")
        eng_block_num += 1
        n_trx = rng.choice([1, 2, 3])
        real, virtual = [], []
        for t in range(n_trx):
            contract = rng.choice(list(CONTRACTS))
            action = rng.choice(CONTRACTS[contract])
            real.append({
                "transactionId": _hex40(rng),
                "contract": contract, "action": action,
                "payload": json.dumps({"quantity": rng.randint(1, 500)},
                                      sort_keys=True),
                "refHiveBlockNumber": ref_block,
            })
        if rng.random() < 0.5:
            base = _hex40(rng)
            for v in range(rng.choice([1, 2])):
                virtual.append({
                    "transactionId": f"{base}-{v}",
                    "contract": "tokens", "action": "checkPendingUnstakes",
                    "payload": "{}",
                    "refHiveBlockNumber": ref_block,
                })
        fx.engine_blocks.append({
            "blockNumber": eng_block_num, "timestamp": ts,
            "transactions": real, "virtualTransactions": virtual,
        })
        # golden engine ops: trx granularity, real then virtual
        # (follower_job.rb flattens real trxs then virtual; sidechain
        # INCLUDES virtual in transaction_num — the semantic asymmetry).
        # Virtual ids are rewritten to '<sentinel>-<n>' before storage
        # (follower_job.rb:170-180), so their stored base id is the
        # 40-zero VIRTUAL_TRX_ID and repeats within a block.
        rewritten = real + [
            {**t, "transactionId":
             f"{VIRTUAL_TRX_ID}-{t['transactionId'].split('-')[1]}"}
            for t in virtual
        ]
        seen: dict[str, int] = {}
        for pos, trx in enumerate(rewritten):
            base_id = trx["transactionId"].split("-")[0]
            idx = seen.get(base_id, 0)
            seen[base_id] = idx + 1
            # stored value = full trx JSON, field order matching
            # flatten_engine_blocks' to_json(struct(...))
            full_json = json.dumps(
                {"transactionId": trx["transactionId"],
                 "contract": trx["contract"], "action": trx["action"],
                 "payload": trx["payload"],
                 "refHiveBlockNumber": trx["refHiveBlockNumber"]},
                separators=(",", ":"))
            fx.engine_ops_expected.append({
                "chain": engine_chain, "block_num": eng_block_num,
                "trx_id": base_id, "trx_index": idx,
                "contract": trx["contract"], "action": trx["action"],
                "transaction_num": pos, "value": full_json,
                "key": (f"{engine_chain}:{eng_block_num}:{base_id}:{idx}:"
                        f"{trx['contract']}:{trx['action']}"),
            })
    return fx


# ---------------------------------------------------------------------------
# parquet writers (pyarrow; no Spark needed to generate)
# ---------------------------------------------------------------------------

_ARROW_SCHEMAS = {
    "blocks": pa.schema([
        ("block_num", pa.int64()), ("previous", pa.string()),
        ("timestamp", pa.timestamp("us")), ("witness", pa.string()),
        ("transaction_merkle_root", pa.string()),
        ("extensions", pa.list_(pa.string())),
        ("transaction_ids", pa.list_(pa.string())),
        ("transactions", pa.list_(pa.struct([
            ("operations", pa.list_(pa.struct([
                ("type", pa.string()), ("value", pa.string())]))),
        ]))),
    ]),
    "virtual_ops": pa.schema([
        ("block", pa.int64()), ("trx_id", pa.string()),
        ("vop_seq", pa.int32()), ("op", pa.list_(pa.string())),
        ("timestamp", pa.timestamp("us")), ("arrival_delay_s", pa.int32()),
    ]),
    "engine_blocks": pa.schema([
        ("blockNumber", pa.int64()), ("timestamp", pa.string()),
        ("transactions", pa.list_(pa.struct([
            ("transactionId", pa.string()), ("contract", pa.string()),
            ("action", pa.string()), ("payload", pa.string()),
            ("refHiveBlockNumber", pa.int64())]))),
        ("virtualTransactions", pa.list_(pa.struct([
            ("transactionId", pa.string()), ("contract", pa.string()),
            ("action", pa.string()), ("payload", pa.string()),
            ("refHiveBlockNumber", pa.int64())]))),
    ]),
    "witness_schedules": pa.schema([
        ("id", pa.int64()), ("current_virtual_time", pa.decimal128(38, 0)),
        ("next_shuffle_block_num", pa.int64()),
        ("current_shuffled_witnesses", pa.list_(pa.string())),
        ("num_scheduled_witnesses", pa.int32()),
        ("majority_version", pa.string()),
        ("median_props", pa.struct([
            ("account_creation_fee", pa.struct([
                ("amount", pa.string()), ("precision", pa.int32()),
                ("nai", pa.string())])),
            ("maximum_block_size", pa.int32()),
            ("sbd_interest_rate", pa.int32())])),
    ]),
}


def write_parquet(fx: Fixtures, out_dir: str) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name in ("blocks", "virtual_ops", "engine_blocks", "witness_schedules"):
        rows = getattr(fx, name)
        table = pa.Table.from_pylist(rows, schema=_ARROW_SCHEMAS[name])
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, path)
        paths[name] = path
    return paths
