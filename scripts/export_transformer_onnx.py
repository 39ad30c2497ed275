"""Export the pinned mini-transformer weights to an ONNX model.

The in-container evidence for real-encoder geometry lives in
goldens/mini_transformer_w.npz + the pure-numpy forward pass
(cortex_spark/embed_transformer.py, tests/test_transformer_geometry.py).
This script materializes the SAME network as an ONNX graph for the prod
seam (embed.embed_udf_onnx) wherever the optional `onnx` package exists —
the sandbox container has neither onnx nor onnxruntime, so the .onnx
artifact is NOT committed (an unvalidatable binary would be worse than
none); tests/test_embed_onnx.py::test_mini_transformer_onnx_parity builds
it through this exporter and pins runtime output == numpy forward pass
where the libs are present.

Usage: python scripts/export_transformer_onnx.py [out.onnx]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cortex_spark.embed_transformer import MiniTransformer  # noqa: E402

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "goldens", "mini_transformer_w.npz")


def build_model(model: MiniTransformer):
    """MiniTransformer weights → onnx.ModelProto (opset 13, no Gelu op —
    the tanh GELU is composed from primitives so the graph matches the
    numpy forward pass bit-for-bit up to runtime kernel rounding)."""
    from onnx import TensorProto, helper, numpy_helper

    w = model.w
    hidden = w["tok"].shape[1]
    heads = model.n_heads
    hd = hidden // heads
    nodes = []
    inits = []
    names = iter(range(10**6))

    def init(arr, name):
        inits.append(numpy_helper.from_array(np.ascontiguousarray(arr), name=name))
        return name

    def const(val, name, dtype=np.float32):
        return init(np.asarray(val, dtype=dtype), name)

    def n(op, ins, out=None, **attrs):
        out = out or f"t{next(names)}"
        nodes.append(helper.make_node(op, ins, [out], **attrs))
        return out

    ids = "input_ids"  # int64 [batch, seq]
    tok = init(w["tok"], "tok")
    pos = init(w["pos"], "pos")
    x = n("Gather", [tok, ids])  # [b, seq, h]
    seq_shape = n("Shape", [ids])
    seq_len = n("Gather", [seq_shape, const([1], "one_idx", np.int64)], axes=0)
    pos_sl = n(
        "Slice",
        [pos, const([0], "sl_start", np.int64), seq_len, const([0], "sl_ax", np.int64)],
    )
    x = n("Add", [x, pos_sl])
    # attention bias from padding: mask = ids != 0 → 0 / -1e9, [b, 1, 1, seq]
    zero_i = const(0, "zero_i64", np.int64)
    is_pad = n("Equal", [ids, zero_i])
    bias2d = n(
        "Where",
        [is_pad, const(-1e9, "neg_inf"), const(0.0, "zero_f")],
    )  # [b, seq]
    bias = n("Unsqueeze", [bias2d, const([1, 2], "unsq_axes", np.int64)])  # [b,1,1,seq]

    def matmul(xin, wname, arr):
        return n("MatMul", [xin, init(arr, wname)])

    for i in range(model.n_layers):
        # [b, seq, h] → [b, heads, seq, hd]
        def split_heads(t, tag):
            r = n("Reshape", [t, const([0, -1, heads, hd], f"shape_{tag}_{i}", np.int64)])
            return n("Transpose", [r], perm=[0, 2, 1, 3])

        q = split_heads(matmul(x, f"wq{i}", w[f"l{i}.wq"]), "q")
        k = split_heads(matmul(x, f"wk{i}", w[f"l{i}.wk"]), "k")
        v = split_heads(matmul(x, f"wv{i}", w[f"l{i}.wv"]), "v")
        kt = n("Transpose", [k], perm=[0, 1, 3, 2])
        scores = n("Div", [n("MatMul", [q, kt]), const(float(np.sqrt(hd)), f"scale{i}")])
        scores = n("Add", [scores, bias])
        p = n("Softmax", [scores], axis=-1)
        att = n("MatMul", [p, v])  # [b, heads, seq, hd]
        att = n("Transpose", [att], perm=[0, 2, 1, 3])
        att = n("Reshape", [att, const([0, -1, hidden], f"merge{i}", np.int64)])
        x = n("Add", [x, matmul(att, f"wo{i}", w[f"l{i}.wo"])])
        x = n(
            "LayerNormalization",
            [x, init(w[f"l{i}.ln1_g"], f"ln1g{i}"), init(w[f"l{i}.ln1_b"], f"ln1b{i}")],
            epsilon=1e-5,
        )
        # tanh GELU: 0.5·h·(1+tanh(√(2/π)·(h+0.044715·h³)))
        h1 = n("Add", [matmul(x, f"w1{i}", w[f"l{i}.w1"]), init(w[f"l{i}.b1"], f"b1{i}")])
        h3 = n("Mul", [n("Mul", [h1, h1]), h1])
        inner = n("Add", [h1, n("Mul", [h3, const(0.044715, f"c1_{i}")])])
        t = n("Tanh", [n("Mul", [inner, const(float(np.sqrt(2.0 / np.pi)), f"c2_{i}")])])
        g = n("Mul", [n("Mul", [h1, const(0.5, f"half{i}")]), n("Add", [t, const(1.0, f"one{i}")])])
        h2 = n("Add", [n("MatMul", [g, init(w[f"l{i}.w2"], f"w2{i}")]), init(w[f"l{i}.b2"], f"b2{i}")])
        x = n(
            "LayerNormalization",
            [n("Add", [x, h2]), init(w[f"l{i}.ln2_g"], f"ln2g{i}"), init(w[f"l{i}.ln2_b"], f"ln2b{i}")],
            epsilon=1e-5,
        )
    # masked mean-pool: sum(x·mask)/max(sum(mask),1)
    maskf = n("Cast", [n("Not", [is_pad])], to=TensorProto.FLOAT)  # [b, seq]
    mask3 = n("Unsqueeze", [maskf, const([2], "m_axes", np.int64)])
    summed = n("ReduceSum", [n("Mul", [x, mask3]), const([1], "rs_axes", np.int64)], keepdims=0)
    counts = n("ReduceSum", [maskf, const([1], "rc_axes", np.int64)], keepdims=1)
    counts = n("Max", [counts, const([[1.0]], "min_count")])
    pooled = n("Div", [summed, counts])
    # L2 normalize (embed.encode_batch_onnx re-normalizes too; harmless twice)
    norm = n("Sqrt", [n("ReduceSum", [n("Mul", [pooled, pooled]), const([1], "rn_axes", np.int64)], keepdims=1)])
    nodes.append(helper.make_node("Div", [pooled, norm], ["output"]))

    graph = helper.make_graph(
        nodes, "mini_transformer",
        [helper.make_tensor_value_info(ids, TensorProto.INT64, ["batch", "seq"])],
        [helper.make_tensor_value_info("output", TensorProto.FLOAT, ["batch", hidden])],
        initializer=inits,
    )
    model_proto = helper.make_model(graph, opset_imports=[helper.make_opsetid("", 17)])
    return model_proto


def main(out_path: str) -> None:
    import onnx

    model = MiniTransformer.load(WEIGHTS)
    proto = build_model(model)
    onnx.checker.check_model(proto)
    onnx.save(proto, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mini_transformer.onnx")
