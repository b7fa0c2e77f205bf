"""SCHP ONNX ingestion + full-network AugmentCE2P parity.

The reference ships its human-parsing weights ONLY as ONNX
(run_parsing.py:20-22), so `Parsing.from_onnx` must ingest that format.
These tests execute the reference's vendored AugmentCE2P
(networks/AugmentCE2P.py) as the oracle — with a 6-line eval-equivalent
shim for InPlaceABNSync (modules/bn.py:61-72: batch_norm + activation;
the CUDA in-place trick is a training-memory optimization) — then:
1. full-network numeric parity of the JAX rebuild on converted weights,
2. a REAL torch.onnx.export round-trip through convert_schp_onnx,
3. the anonymous-initializer positional fallback on the same graph.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")

torch = pytest.importorskip("torch")


class _EvalABN(torch.nn.Module):
    """Eval-time equivalent of the vendored InPlaceABNSync
    (modules/bn.py:61-72): batch_norm with running stats, then the
    configured activation."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 activation="leaky_relu", slope=0.01):
        super().__init__()
        self.bn = torch.nn.BatchNorm2d(num_features, eps=eps,
                                       momentum=momentum, affine=affine)
        self.activation, self.slope = activation, slope

    def forward(self, x):
        x = self.bn(x)
        if self.activation == "leaky_relu":
            return torch.nn.functional.leaky_relu(x, self.slope)
        if self.activation == "none":
            return x
        raise NotImplementedError(self.activation)


@pytest.fixture(scope="module")
def ref_augmentce2p():
    mod_stub = types.ModuleType("modules")
    mod_stub.__spec__ = importlib.machinery.ModuleSpec("modules", loader=None)
    mod_stub.InPlaceABNSync = _EvalABN
    sys.modules.setdefault("modules", mod_stub)
    spec = importlib.util.spec_from_file_location(
        "ref_augmentce2p",
        os.path.join(REF, "preprocess/humanparsing/networks/AugmentCE2P.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_augmentce2p"] = mod
    spec.loader.exec_module(mod)
    return mod


def _rename_bn_keys(sd):
    """_EvalABN nests the BatchNorm under `.bn`, the real InPlaceABNSync is
    flat — flatten to the published checkpoint key layout."""
    return {k.replace(".bn.weight", ".weight")
             .replace(".bn.bias", ".bias")
             .replace(".bn.running_mean", ".running_mean")
             .replace(".bn.running_var", ".running_var"): v.numpy()
            for k, v in sd.items() if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def torch_model(ref_augmentce2p):
    torch.manual_seed(0)
    net = ref_augmentce2p.resnet101(num_classes=18, pretrained=None).eval()
    # perturb BN stats away from init so BN parity is actually exercised
    g = torch.Generator().manual_seed(1)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
    return net


@pytest.fixture(scope="module")
def oracle_io(torch_model):
    x = np.random.default_rng(7).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        [[parsing, fusion], edge] = torch_model(torch.from_numpy(x))
    return x, (parsing.numpy(), fusion.numpy(), edge.numpy())


def _run_mine(params, x_nchw):
    import jax.numpy as jnp
    from idmvton_tpu.preprocess.schp import schp_apply
    parsing, fusion, edge = schp_apply(
        params, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)))
    to_nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)
    return to_nchw(parsing), to_nchw(fusion), to_nchw(edge)


def _assert_close(got, want, atol=5e-4):
    for g, w, name in zip(got, want, ("parsing", "fusion", "edge")):
        np.testing.assert_allclose(g, w, atol=atol, rtol=1e-3,
                                   err_msg=name)


def test_augmentce2p_full_network_parity(torch_model, oracle_io):
    """The whole SCHP network (stem, ResNet-101, PSP, decoder, edge, fusion)
    numerically matches the executed reference on converted weights."""
    from idmvton_tpu.preprocess.schp import convert_schp

    x, want = oracle_io
    params = convert_schp(_rename_bn_keys(torch_model.state_dict()), 18,
                          strict=True)
    _assert_close(_run_mine(params, x), want)


def _export_onnx(net, path, do_constant_folding):
    """torch.onnx.export without the onnx package: the only hard dependency
    is _add_onnxscript_fn, a no-op post-pass for graphs with no onnxscript
    custom functions."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, _: model_bytes
    try:
        torch.onnx.export(net, torch.zeros(1, 3, 64, 64), path,
                          opset_version=11, dynamo=False,
                          do_constant_folding=do_constant_folding,
                          input_names=["input.1"])
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


@pytest.fixture(scope="module")
def onnx_path(torch_model, tmp_path_factory):
    # The torchscript export of ResNet-101 costs minutes on this 1-CPU host
    # and the model is fully seeded (manual_seed + explicit generators), so
    # the artifact is byte-stable across runs: cache it next to the jax
    # compile cache, keyed by torch version (r4 verdict #5 — suite wall time)
    cache = os.path.join("/tmp/idmvton_jax_test_cache",
                         f"parsing_test_torch{torch.__version__}.onnx")
    if os.path.isfile(cache):
        return cache
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = str(tmp_path_factory.mktemp("onnx") / "parsing_test.onnx")
    _export_onnx(torch_model, tmp, do_constant_folding=True)
    os.replace(tmp, cache)
    return cache


def test_onnx_reader_parses_real_export(onnx_path):
    from idmvton_tpu.weights.onnx_reader import read_onnx
    model = read_onnx(onnx_path)
    assert len(model.initializers) > 100
    assert any(n.op_type == "Conv" for n in model.nodes)
    kinds = {a.dtype.kind for a in model.initializers.values()}
    assert "f" in kinds
    shapes = [a.shape for a in model.initializers.values() if a.ndim == 4]
    assert (64, 3, 3, 3) in shapes  # conv1: 3->64 3x3 (AugmentCE2P.py:308)


def test_from_onnx_matches_reference(onnx_path, oracle_io):
    from idmvton_tpu.preprocess.schp import convert_schp_onnx
    x, want = oracle_io
    params = convert_schp_onnx(onnx_path, 18)
    _assert_close(_run_mine(params, x), want)


def test_from_onnx_positional_fallback(onnx_path, oracle_io):
    """Strip every initializer name (as older exporters emit numeric ids):
    the node-trace walk must still bind all weights correctly."""
    from idmvton_tpu.preprocess.schp import (
        _positional_state_dict, _synthesize_identity_bn, convert_schp)
    from idmvton_tpu.weights.onnx_reader import read_onnx, OnnxModel, OnnxNode

    model = read_onnx(onnx_path)
    rename = {k: str(i) for i, k in enumerate(model.initializers)}
    anon = OnnxModel(
        initializers={rename[k]: v for k, v in model.initializers.items()},
        nodes=[OnnxNode(n.op_type, "", tuple(rename.get(i, i)
                                             for i in n.inputs), n.outputs)
               for n in model.nodes],
        graph_inputs=model.graph_inputs, graph_outputs=model.graph_outputs)

    sd = _positional_state_dict(anon, 18)
    if "bn1.weight" not in sd:
        sd = _synthesize_identity_bn(sd, 18)
    params = convert_schp(sd, 18)
    x, want = oracle_io
    _assert_close(_run_mine(params, x), want)


def test_parsing_from_onnx_end_to_end(onnx_path):
    """Parsing.from_onnx loads the shipped artifact format
    (run_parsing.py:20-22) and produces a palette image + face mask."""
    from idmvton_tpu.preprocess.schp import Parsing

    # reuse the module-scoped export for both slots: the 18-class model is
    # shape-compatible with the LIP slot too (the wrapper only argmaxes
    # channel 13 of whatever comes out)
    parser = Parsing.from_onnx(onnx_path, onnx_path)
    img = (np.random.default_rng(8).uniform(0, 255, (96, 64, 3))
           .astype(np.uint8))
    out, face = parser(img)
    assert out.size == (64, 96)
    assert np.asarray(face).shape == (96, 64)
