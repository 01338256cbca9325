import numpy as np

from topomap_tpu.data import (
    PairsRecord,
    PairsDataset,
    RepeatDataset,
    generate_pairs_dataset,
    read_pairs_jsonl,
    stratified_split,
    stratified_split_ratio,
    write_pairs_jsonl,
)


def _mk_records(prompts_counts):
    recs = []
    for p, n in prompts_counts.items():
        for i in range(n):
            recs.append(PairsRecord(prompt=p, source=f"s_{p}_{i}.png", target=f"t_{p}_{i}.png"))
    return recs


def test_pairs_record_alias_keys():
    r = PairsRecord.from_json({"prompt": "x", "seg_path": "a.png", "gt": "b.png"})
    assert r.source == "a.png" and r.target == "b.png"
    r2 = PairsRecord.from_json({"control": "c.png", "gt_path": "d.png"})
    assert r2.prompt == "" and r2.source == "c.png"


def test_stratified_split_fixed_counts():
    recs = _mk_records({"a": 30, "b": 30})
    tr, va, te = stratified_split(recs, per_prompt_counts=(20, 5, 5))
    assert len(tr) == 40 and len(va) == 10 and len(te) == 10
    # per-prompt balance
    assert sum(r.prompt == "a" for r in tr) == 20
    # disjointness
    all_ids = {(r.prompt, r.source) for r in tr + va + te}
    assert len(all_ids) == 60


def test_stratified_split_ratio_remainder_to_train_and_tiny_groups():
    recs = _mk_records({"big": 100, "tiny": 3})
    tr, va, te = stratified_split_ratio(recs, (0.8, 0.1, 0.1), min_per_split=2)
    big_tr = sum(r.prompt == "big" for r in tr)
    assert big_tr == 80
    assert sum(r.prompt == "big" for r in va) == 10
    # tiny group goes entirely to train
    assert sum(r.prompt == "tiny" for r in tr) == 3
    assert all(r.prompt != "tiny" for r in va + te)


def test_split_deterministic_seed():
    recs = _mk_records({"a": 50})
    tr1, _, _ = stratified_split_ratio(recs, shuffle_seed=42)
    tr2, _, _ = stratified_split_ratio(recs, shuffle_seed=42)
    assert [r.source for r in tr1] == [r.source for r in tr2]


def test_jsonl_roundtrip(tmp_path):
    recs = _mk_records({"a": 3})
    p = tmp_path / "pairs.jsonl"
    write_pairs_jsonl(p, recs)
    back = read_pairs_jsonl(p)
    assert [r.to_json() for r in back] == [r.to_json() for r in recs]


def test_synthetic_dataset_end_to_end(tmp_path):
    recs = generate_pairs_dataset(tmp_path, n_tiles=2, prompts=["", "Set Forest color to dark green"], seed=1)
    assert len(recs) == 4
    ds = PairsDataset(recs, size=64)
    item = ds[0]
    assert item["seg"].shape == (64, 64, 3) and item["gt"].shape == (64, 64, 3)
    assert 0.0 <= item["seg"].min() and item["seg"].max() <= 1.0
    assert -1.0 <= item["gt"].min() and item["gt"].max() <= 1.0
    batch = next(ds.iter_batches(batch_size=2, shuffle=True, seed=0))
    assert batch["seg"].shape == (2, 64, 64, 3) and len(batch["prompt"]) == 2


def test_repeat_dataset():
    recs = _mk_records({"a": 2})
    rd = RepeatDataset(recs, 5)
    assert len(rd) == 10
    assert rd[3].source == recs[1].source
