"""ResNet-50 grid-feature backbone parity vs a hand-built torch golden model.

torchvision is not available in this image, so the golden model is a minimal
torch Bottleneck ResNet-50 defined here (both stride conventions), exporting
torchvision-style and detectron2-style key names for the importers. Its
eval-mode BatchNorm exercises our frozen-BN folding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.ckpt import torch_import as ti
from clipbert_tpu.models import resnet as jres

torch = pytest.importorskip("torch")
nn = torch.nn

STAGES = [(3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048)]


class Bottleneck(nn.Module):
    def __init__(self, cin, cmid, cout, stride, stride_in_1x1):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = nn.Conv2d(cin, cmid, 1, stride=s1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, stride=s2, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + sc)


class TorchR50(nn.Module):
    def __init__(self, stride_in_1x1=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for i, (n, cmid, cout) in enumerate(STAGES):
            blocks = []
            for b in range(n):
                stride = 1 if (i == 0 or b > 0) else 2
                blocks.append(Bottleneck(cin if b == 0 else cout, cmid, cout,
                                         stride if b == 0 else 1,
                                         stride_in_1x1))
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            cin = cout

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            h = getattr(self, f"layer{i + 1}")(h)
        return h


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)


def _make_torch_r50(seed, stride_in_1x1):
    torch.manual_seed(seed)
    m = TorchR50(stride_in_1x1)
    _randomize_bn(m)
    m.eval()
    return m


def test_resnet50_res5_parity_torchvision_scheme():
    m = _make_torch_r50(0, stride_in_1x1=False)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ti.import_resnet50_torchvision(sd))

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, size=(2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    out = np.asarray(jres.resnet50_forward(params, jnp.asarray(x),
                                           stride_in_1x1=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_d2_importer_stride_in_1x1_and_bgr_fold():
    m = _make_torch_r50(1, stride_in_1x1=True)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    # rename to the d2 scheme (inverse of reference load_save.py:315-363)
    rename = {"layer1": "res2", "layer2": "res3", "layer3": "res4",
              "layer4": "res5", "bn1": "conv1.norm", "bn2": "conv2.norm",
              "bn3": "conv3.norm", "downsample.0": "shortcut",
              "downsample.1": "shortcut.norm"}
    d2sd = {}
    for name, v in sd.items():
        for old, new in rename.items():
            name = name.replace(old, new)
        if not name.startswith("res"):
            name = f"stem.{name}"
        d2sd[name] = v

    params = jax.tree.map(
        jnp.asarray, ti.import_resnet50_d2(d2sd, bgr_checkpoint=True))

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, size=(1, 64, 64, 3)).astype(np.float32)
    # golden torch model consumes BGR (as a d2 caffe checkpoint would);
    # our importer folds the flip so the jax model consumes RGB directly
    with torch.no_grad():
        t = torch.tensor(np.transpose(x[..., ::-1], (0, 3, 1, 2)).copy())
        ref = np.transpose(m(t).numpy(), (0, 2, 3, 1))
    out = np.asarray(jres.resnet50_forward(params, jnp.asarray(x),
                                           stride_in_1x1=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_grid_encoder_parity():
    torch.manual_seed(2)
    tmod = nn.Sequential(
        nn.Conv2d(32, 16, kernel_size=3, stride=1, padding=1, bias=False),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.ReLU())
    tmod.eval()
    sd = {f"grid_encoder.{k}": v.detach().numpy()
          for k, v in tmod.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ti.import_grid_encoder(sd))

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, size=(2, 14, 14, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    out = np.asarray(jres.grid_encoder_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_grid_feat_shapes():
    key = jax.random.PRNGKey(0)
    params = {"resnet": jres.init_resnet50(key),
              "grid_encoder": jres.init_grid_encoder(key, 64)}
    frames = jnp.zeros((2, 3, 128, 128, 3), jnp.float32)
    grid = jres.grid_feat_forward(params, frames)
    assert grid.shape == (2, 3, 2, 2, 64)  # 128/32/2 = 2


def test_space_to_depth_stem_exact(rng_np):
    """s2d stem path is mathematically identical to the 7x7/s2 stem."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    k = jnp.asarray(rng_np.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    x = jnp.asarray(rng_np.standard_normal((2, 64, 48, 3)), jnp.float32)
    ref = resnet.conv2d(x, k, stride=2, padding=[(3, 3), (3, 3)])
    got = resnet.conv2d(resnet.space_to_depth(x), resnet.stem_s2d_kernel(k),
                        stride=1, padding=[(2, 1), (2, 1)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_forward_s2d_matches_plain(rng_np):
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    p = resnet.init_resnet50(jax.random.key(3))
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    a = resnet.resnet50_forward(p, x, stem_s2d=False)
    b = resnet.resnet50_forward(p, x, stem_s2d=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-4)


def test_fold_bn_scales_exact(rng_np):
    """Folded params (kernel*scale, bias-only BN) reproduce the unfolded
    forward — the inference-path param prep must be numerically exact."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    p = resnet.init_resnet50(jax.random.key(5))
    # non-trivial scales/biases everywhere (init leaves scale=1)
    def randomize(node):
        if isinstance(node, dict):
            if "scale" in node and "bias" in node:
                c = node["scale"].shape[0]
                return {"scale": jnp.asarray(
                            0.5 + rng_np.random(c), jnp.float32),
                        "bias": jnp.asarray(
                            rng_np.standard_normal(c), jnp.float32)}
            return {k: randomize(v) for k, v in node.items()}
        if isinstance(node, list):
            return [randomize(b) for b in node]
        return node
    p = randomize(p)
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    ref = resnet.resnet50_forward(p, x)
    pf = resnet.fold_bn_scales(p)
    # every BN lost its scale leaf
    leaves = jax.tree.leaves(pf)
    assert len(leaves) < len(jax.tree.leaves(p))
    got = resnet.resnet50_forward(pf, x)
    # identical in exact arithmetic; fp32 rounding compounds over 53 convs
    # and the randomized scales, so tolerate ~1e-3 of the output scale
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3 * scale)


def test_fold_cnn_bn_scales_model_level(rng_np):
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert
    cfg = ModelConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=64,
                      max_grid_row_position_embeddings=8,
                      max_grid_col_position_embeddings=8,
                      num_labels=2, loss_type="ce")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    batch = {"text_input_ids": jnp.zeros((1, 8), jnp.int32),
             "text_input_mask": jnp.ones((1, 8), jnp.int32),
             "visual_inputs": jnp.asarray(
                 rng_np.standard_normal((1, 2, 64, 64, 3)), jnp.float32)}
    ref = clipbert.clipbert_forward(params, cfg, batch, "retrieval",
                                    compute_dtype=jnp.float32)["logits"]
    pf = clipbert.fold_cnn_bn_scales(params)
    got = clipbert.clipbert_forward(pf, cfg, batch, "retrieval",
                                    compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_remat_forward_and_grad_match(rng_np):
    """jax.checkpoint'ed stages recompute the same math: forward and grads
    must match the plain path (the remat knob must be numerics-free)."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    p = resnet.init_resnet50(jax.random.key(11))
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)

    def loss(params, x, remat):
        return resnet.resnet50_forward(params, x, remat=remat).sum()

    f0 = loss(p, x, False)
    g0 = jax.grad(loss, argnums=1)(p, x, False)
    # every remat granularity (scripts/perf_conv_bwd_ab.py A/Bs their perf;
    # this pins that the knob stays numerics-free)
    for mode in (True, "stage", "block", "early"):
        f1 = loss(p, x, mode)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-6)
        g1 = jax.grad(loss, argnums=1)(p, x, mode)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-5)
