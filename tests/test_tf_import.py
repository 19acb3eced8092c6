"""TF-1 BERT checkpoint import (reference transformers.py:64-137).

The structural mapping is proven by equivalence: the same weights exported
under TF-1 names (kernels stored (in,out), gamma/beta, output_weights) must
import to exactly the pytree the torch path produces. A second, gated test
writes a real TF checkpoint and reads it back through tensorflow.
"""

import numpy as np
import pytest

from clipbert_tpu.ckpt import torch_import as ti

NUM_LAYERS = 2
D, I, V = 16, 32, 50


def _torch_sd(rng):
    """Random torch-style BERT state_dict (2 layers + heads)."""
    sd = {}

    def dense(name, o, i):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(d).astype(np.float32)

    for tbl, rows in (("word_embeddings", V), ("position_embeddings", 40),
                      ("token_type_embeddings", 2)):
        sd[f"embeddings.{tbl}.weight"] = rng.standard_normal(
            (rows, D)).astype(np.float32)
    ln("embeddings.LayerNorm", D)
    for l in range(NUM_LAYERS):
        pre = f"encoder.layer.{l}"
        for q in ("query", "key", "value"):
            dense(f"{pre}.attention.self.{q}", D, D)
        dense(f"{pre}.attention.output.dense", D, D)
        ln(f"{pre}.attention.output.LayerNorm", D)
        dense(f"{pre}.intermediate.dense", I, D)
        dense(f"{pre}.output.dense", D, I)
        ln(f"{pre}.output.LayerNorm", D)
    dense("pooler.dense", D, D)
    dense("cls.predictions.transform.dense", D, D)
    ln("cls.predictions.transform.LayerNorm", D)
    sd["cls.predictions.bias"] = rng.standard_normal(V).astype(np.float32)
    sd["cls.seq_relationship.weight"] = rng.standard_normal(
        (2, D)).astype(np.float32)
    sd["cls.seq_relationship.bias"] = rng.standard_normal(2).astype(np.float32)
    return sd


def _to_tf_names(sd):
    """Export torch-style names/layouts to TF-1 names (google BERT style)."""
    tf = {}
    for name, arr in sd.items():
        n = name
        if not n.startswith("cls."):
            n = "bert." + n
        n = n.replace("layer.", "layer_").replace(".", "/")
        if n.endswith("/LayerNorm/weight"):
            n = n[:-len("weight")] + "gamma"
        elif n.endswith("/LayerNorm/bias"):
            n = n[:-len("bias")] + "beta"
        elif "seq_relationship" in n and n.endswith("/weight"):
            n = n[:-len("weight")] + "output_weights"
        elif n == "cls/predictions/bias":
            n = "cls/predictions/output_bias"
        elif "seq_relationship" in n and n.endswith("/bias"):
            n = n[:-len("bias")] + "output_bias"
        elif n.endswith("embeddings/weight"):
            n = n[:-len("/weight")]
        elif n.endswith("/weight"):
            n = n[:-len("weight")] + "kernel"
            arr = np.ascontiguousarray(arr.T)
        tf[n] = arr
    # optimizer slots must be skipped by the importer
    tf["bert/encoder/layer_0/attention/self/query/kernel/adam_m"] = \
        np.zeros((D, D), np.float32)
    tf["global_step"] = np.array(7, np.int64)
    return tf


def test_tf_names_import_equals_torch_import(rng_np):
    sd = _torch_sd(rng_np)
    tf_flat = _to_tf_names(sd)

    got = ti.import_bert_tf(tf_flat, NUM_LAYERS)
    want = {
        "embeddings": ti.import_bert_text_embeddings(sd),
        "encoder": ti.import_bert_encoder(sd, NUM_LAYERS),
        "pooler": ti.import_bert_pooler(sd),
        "cls": ti.import_pretraining_heads(sd),
    }
    import jax
    jax.tree.map(np.testing.assert_array_equal, got, want)


def test_real_tf_checkpoint_roundtrip(tmp_path, rng_np):
    tf_mod = pytest.importorskip("tensorflow")
    sd = _torch_sd(rng_np)
    tf_flat = {k: v for k, v in _to_tf_names(sd).items()
               if "adam" not in k and k != "global_step"}

    tf1 = tf_mod.compat.v1
    with tf1.Graph().as_default():
        variables = [tf1.get_variable(n, initializer=v)
                     for n, v in tf_flat.items()]
        saver = tf1.train.Saver(variables)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt = str(tmp_path / "bert_model.ckpt")
            saver.save(sess, ckpt)

    loaded = ti.load_tf_checkpoint(ckpt)
    for n, v in tf_flat.items():
        np.testing.assert_array_equal(loaded[n], v)

    got = ti.import_bert_tf(ckpt, NUM_LAYERS)
    want = ti.import_bert_tf(tf_flat, NUM_LAYERS)
    import jax
    jax.tree.map(np.testing.assert_array_equal, got, want)
