"""HuggingFace-format checkpoint conversion for the text towers.

The reference loads ``bert-base-uncased`` via HF ``BertModel.from_pretrained``
(``addlrSD.py:128``) and CLIP via the LDM ``FrozenCLIPEmbedder`` (HF
``CLIPTextModel`` inside). These key maps convert those state dicts into
``topomap_tpu.models.text_encoders`` parameter trees (and back), so real pretrained text
encoders drop in when their weights are available.

Same conventions as ``torch_ckpt``: torch Linear ``[out,in]`` ↔ ours ``[in,out]``; all
numpy; overlay semantics via ``torch_ckpt.import_keymap``.
"""
from __future__ import annotations

from topomap_tpu.models.text_encoders import TextEncoderConfig
from topomap_tpu.utils.torch_ckpt import _dense_entries, _norm_entries, _ID, _lin_in, _lin_out


def bert_keymap(cfg: TextEncoderConfig, prefix: str = ""):
    """HF ``BertModel`` naming → our tree. ``prefix`` e.g. "" or "bert."."""
    pf = prefix
    e = [
        (f"{pf}embeddings.word_embeddings.weight", ("tok_emb",), _ID, _ID),
        (f"{pf}embeddings.position_embeddings.weight", ("pos_emb",), _ID, _ID),
        (f"{pf}embeddings.token_type_embeddings.weight", ("type_emb",), _ID, _ID),
    ]
    e += _norm_entries(f"{pf}embeddings.LayerNorm", ("emb_ln",))
    for i in range(cfg.layers):
        lp = f"{pf}encoder.layer.{i}"
        path = ("layers", i)
        e += _dense_entries(f"{lp}.attention.self.query", path + ("attn", "q"))
        e += _dense_entries(f"{lp}.attention.self.key", path + ("attn", "k"))
        e += _dense_entries(f"{lp}.attention.self.value", path + ("attn", "v"))
        e += _dense_entries(f"{lp}.attention.output.dense", path + ("attn", "out"))
        e += _norm_entries(f"{lp}.attention.output.LayerNorm", path + ("ln1",))
        e += _dense_entries(f"{lp}.intermediate.dense", path + ("mlp", "fc1"))
        e += _dense_entries(f"{lp}.output.dense", path + ("mlp", "fc2"))
        e += _norm_entries(f"{lp}.output.LayerNorm", path + ("ln2",))
    return e


def clip_text_keymap(cfg: TextEncoderConfig, prefix: str = "text_model."):
    """HF ``CLIPTextModel`` naming → our tree. LDM FrozenCLIPEmbedder stores it under
    ``cond_stage_model.transformer.text_model.`` — pass that as ``prefix`` for full-ckpt
    loads."""
    pf = prefix
    e = [
        (f"{pf}embeddings.token_embedding.weight", ("tok_emb",), _ID, _ID),
        (f"{pf}embeddings.position_embedding.weight", ("pos_emb",), _ID, _ID),
    ]
    for i in range(cfg.layers):
        lp = f"{pf}encoder.layers.{i}"
        path = ("layers", i)
        e += _dense_entries(f"{lp}.self_attn.q_proj", path + ("attn", "q"))
        e += _dense_entries(f"{lp}.self_attn.k_proj", path + ("attn", "k"))
        e += _dense_entries(f"{lp}.self_attn.v_proj", path + ("attn", "v"))
        e += _dense_entries(f"{lp}.self_attn.out_proj", path + ("attn", "out"))
        e += _norm_entries(f"{lp}.layer_norm1", path + ("ln1",))
        e += _dense_entries(f"{lp}.mlp.fc1", path + ("mlp", "fc1"))
        e += _dense_entries(f"{lp}.mlp.fc2", path + ("mlp", "fc2"))
        e += _norm_entries(f"{lp}.layer_norm2", path + ("ln2",))
    e += _norm_entries(f"{pf}final_layer_norm", ("final_ln",))
    return e
