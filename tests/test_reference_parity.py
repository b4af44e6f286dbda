"""Full-model logit parity against the ACTUAL reference torch code.

The strongest parity evidence short of the real dataset: import the
reference implementations from ``/root/reference`` (torch CPU), random-
init them with randomized BatchNorm statistics, export the state dicts,
convert through our importers, and assert whole-model outputs match on
identical inputs.

- PointNet++ semseg (`PointNet/models/pointnet2_sem_seg.py:6-40` over
  `pointnet_util.py:63-320`): the forward's only nondeterminism is the
  FPS start index (`torch.randint`, `pointnet_util.py:75`); pinned to 0
  on both sides, the full 4096-point eval forward matches to ~1e-6 —
  this exercises FPS, the index-ordered ball query, 3-NN interpolation,
  BN-eval composition, and the importer end to end.
- ResGCN DenseDeepGCN (`ResGCN/sem_seg_dense/architecture.py:6-68` over
  `gcn_lib/dense/`): feature-space dynamic kNN makes full-forward
  bit-parity chaotic across frameworks — ~1e-7 feature differences flip
  near-tie neighbor choices (measured: 0.07% of edges at block 1), and
  EdgeConv amplifies the flips downstream. The strong assertion is
  therefore graph-pinned: with the reference's own edge graphs injected
  (``DenseDeepGCN(..., graphs=...)``) logits match to ~1e-5; end-to-end
  with each side computing its own graphs, predictions still agree.

The reference trees are imported read-only; tests skip cleanly if the
reference checkout is absent.
"""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_POINTNET = "/root/reference/PointNet"
REF_RESGCN = "/root/reference/ResGCN"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_POINTNET) and os.path.isdir(REF_RESGCN)),
    reason="reference checkout not available",
)


def _randomize_bn(model):
    """Non-trivial BN statistics so the eval forward actually exercises
    the running-stat mapping (fresh-init stats are the identity)."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.normal_()
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_()
            m.bias.data.normal_()


class _zero_randint:
    """Pin `pointnet_util.py:75`'s FPS start index to 0 (our
    deterministic forward's start, `ops/sampling.py`)."""

    def __enter__(self):
        self._orig = torch.randint

        def zero(low, high, size, **kw):
            return torch.zeros(size, dtype=kw.get("dtype", torch.long))

        torch.randint = zero
        return self

    def __exit__(self, *exc):
        torch.randint = self._orig
        return False


@pytest.fixture(scope="module")
def ref_pointnet2_module():
    sys.path.insert(0, REF_POINTNET)
    stash = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "models" or k.startswith("models.")
    }
    importlib.invalidate_caches()
    try:
        yield importlib.import_module("models.pointnet2_sem_seg")
    finally:
        sys.path.remove(REF_POINTNET)
        for k in list(sys.modules):
            if k == "models" or k.startswith("models."):
                del sys.modules[k]
        sys.modules.update(stash)


@pytest.fixture(scope="module")
def ref_resgcn_module():
    # torch_cluster is imported at module scope by `torch_edge.py:3` but
    # only used by the sparse knn path ('matrix' is the dense default).
    sys.modules.setdefault(
        "torch_cluster", types.SimpleNamespace(knn_graph=None)
    )
    sys.path.insert(0, REF_RESGCN)
    importlib.invalidate_caches()
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_resgcn_architecture",
            os.path.join(REF_RESGCN, "sem_seg_dense", "architecture.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REF_RESGCN)


@pytest.fixture(scope="module")
def ref_object_modules():
    """The reference's cls/part-seg model zoo. The cls models import
    ``from pointnet_util import ...`` (`pointnet2_cls_ssg.py:3`) so the
    models/ directory itself must be on sys.path; the part-seg models
    import ``from models.pointnet_util import ...``."""
    models_dir = os.path.join(REF_POINTNET, "models")
    sys.path.insert(0, REF_POINTNET)
    sys.path.insert(0, models_dir)
    tops = ("models", "pointnet_util", "pointnet2_cls_ssg",
            "pointnet2_cls_msg", "pointnet", "pointnet_sem_seg",
            "pointnet_cls", "pointnet_part_seg")
    stash = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k.split(".")[0] in tops}
    importlib.invalidate_caches()
    try:
        yield {
            "cls_ssg": importlib.import_module("pointnet2_cls_ssg"),
            "cls_msg": importlib.import_module("pointnet2_cls_msg"),
            "part_ssg": importlib.import_module(
                "models.pointnet2_part_seg_ssg"),
            "part_msg": importlib.import_module(
                "models.pointnet2_part_seg_msg"),
            "semseg_msg": importlib.import_module(
                "models.pointnet2_sem_seg_msg"),
            "pn_semseg": importlib.import_module("pointnet_sem_seg"),
            "pn_cls": importlib.import_module("pointnet_cls"),
            "pn_part": importlib.import_module("pointnet_part_seg"),
        }
    finally:
        sys.path.remove(models_dir)
        sys.path.remove(REF_POINTNET)
        for k in list(sys.modules):
            if k.split(".")[0] in tops:
                del sys.modules[k]
        sys.modules.update(stash)


class TestPointNet2FullModelParity:
    def test_logits_match_reference(self, ref_pointnet2_module):
        from pointsecguard_tpu.models import PointNet2SemSegSSG
        from pointsecguard_tpu.utils.importers import import_pointnet2_semseg

        torch.manual_seed(0)
        ref = ref_pointnet2_module.get_model(13)
        _randomize_bn(ref)
        ref.eval()

        pts = np.random.RandomState(42).rand(1, 4096, 9).astype(np.float32)
        with _zero_randint(), torch.no_grad():
            ref_out, ref_l4 = ref(torch.from_numpy(pts.transpose(0, 2, 1)))
        ref_np = ref_out.numpy()  # [B, N, 13] log-probs

        ours = PointNet2SemSegSSG(num_classes=13)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet2_semseg(ref.state_dict())
        )
        out, l4 = ours.apply(variables, jnp.asarray(pts))

        np.testing.assert_allclose(np.asarray(out), ref_np, atol=1e-4)
        # bottleneck features too ([B, 512, 16] torch vs [B, 16, 512] ours)
        np.testing.assert_allclose(
            np.asarray(l4),
            ref_l4.numpy().transpose(0, 2, 1),
            atol=1e-4,
        )


class TestPointNet2SemSegMSGParity:
    """Full-model parity for the MSG semseg variant
    (`pointnet2_sem_seg_msg.py:6-41`): two-scale MSG levels at every SA
    stage plus the None-skip fp1."""

    def test_logits_match_reference(self, ref_object_modules):
        from pointsecguard_tpu.models import PointNet2SemSegMSG
        from pointsecguard_tpu.utils.importers import (
            import_pointnet2_semseg_msg,
        )

        torch.manual_seed(7)
        ref = ref_object_modules["semseg_msg"].get_model(13)
        _randomize_bn(ref)
        ref.eval()

        pts = np.random.RandomState(15).rand(1, 2048, 9).astype(np.float32)
        with _zero_randint(), torch.no_grad():
            ref_out, ref_l4 = ref(torch.from_numpy(pts.transpose(0, 2, 1)))

        ours = PointNet2SemSegMSG(num_classes=13)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet2_semseg_msg(ref.state_dict())
        )
        out, l4 = ours.apply(variables, jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(l4), ref_l4.numpy().transpose(0, 2, 1), atol=1e-4
        )


class TestPointNetFamilyParity:
    """Full-model parity for the plain PointNet family (`pointnet.py`
    STN3d/STNkd/PointNetEncoder + the three heads). No FPS/ball query —
    the forwards are deterministic tensor math, so parity is direct."""

    def test_semseg_logits_match(self, ref_object_modules):
        from pointsecguard_tpu.models import PointNetSemSeg
        from pointsecguard_tpu.utils.importers import import_pointnet_semseg

        torch.manual_seed(8)
        ref = ref_object_modules["pn_semseg"].get_model(13, with_rgb=True)
        _randomize_bn(ref)
        ref.eval()
        pts = np.random.RandomState(21).rand(2, 512, 9).astype(np.float32)
        with torch.no_grad():
            ref_out, ref_tf = ref(torch.from_numpy(pts.transpose(0, 2, 1)))

        ours = PointNetSemSeg(num_classes=13, with_rgb=True)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet_semseg(ref.state_dict())
        )
        out, tf = ours.apply(variables, jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(tf), ref_tf.numpy(),
                                   atol=1e-4)

    def test_cls_logits_match(self, ref_object_modules):
        from pointsecguard_tpu.models import PointNetCls
        from pointsecguard_tpu.utils.importers import import_pointnet_cls

        torch.manual_seed(9)
        ref = ref_object_modules["pn_cls"].get_model(40, normal_channel=True)
        _randomize_bn(ref)
        ref.eval()
        pts = np.random.RandomState(23).rand(2, 512, 6).astype(np.float32)
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(pts.transpose(0, 2, 1)))

        ours = PointNetCls(num_classes=40, normal_channel=True)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet_cls(ref.state_dict())
        )
        out, _ = ours.apply(variables, jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)

    def test_partseg_logits_match(self, ref_object_modules):
        from pointsecguard_tpu.models import PointNetPartSeg
        from pointsecguard_tpu.utils.importers import import_pointnet_partseg

        torch.manual_seed(10)
        ref = ref_object_modules["pn_part"].get_model(
            50, normal_channel=True
        )
        _randomize_bn(ref)
        ref.eval()
        rs = np.random.RandomState(25)
        pts = rs.rand(2, 512, 6).astype(np.float32)
        one_hot = np.eye(16, dtype=np.float32)[rs.randint(0, 16, size=2)]
        with torch.no_grad():
            # the reference squeezes a [B, 1, 16] label
            # (`pointnet_part_seg.py:64`)
            ref_out, _ = ref(
                torch.from_numpy(pts.transpose(0, 2, 1)),
                torch.from_numpy(one_hot[:, None, :]),
            )

        ours = PointNetPartSeg(part_num=50, normal_channel=True)
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_pointnet_partseg(ref.state_dict())
        )
        out, _ = ours.apply(variables, jnp.asarray(pts), jnp.asarray(one_hot))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)


class TestPointNet2ClsParity:
    """Full-model parity for the classification zoo
    (`pointnet2_cls_ssg.py:6-39`, `pointnet2_cls_msg.py:6-40`): covers
    MSG grouping (feats-first channel order, `pointnet_util.py:255`),
    the group-all global layer, and the FC head's BatchNorm1d mapping."""

    @pytest.mark.parametrize("variant", ["ssg", "msg"])
    def test_logits_match_reference(self, ref_object_modules, variant):
        from pointsecguard_tpu.models import (
            PointNet2ClsMSG,
            PointNet2ClsSSG,
        )
        from pointsecguard_tpu.utils.importers import import_pointnet2_cls

        torch.manual_seed(3)
        ref = ref_object_modules[f"cls_{variant}"].get_model(
            40, normal_channel=True
        )
        _randomize_bn(ref)
        ref.eval()

        pts = np.random.RandomState(11).rand(2, 1024, 6).astype(np.float32)
        with _zero_randint(), torch.no_grad():
            ref_out, ref_l3 = ref(torch.from_numpy(pts.transpose(0, 2, 1)))

        cls = PointNet2ClsMSG if variant == "msg" else PointNet2ClsSSG
        ours = cls(num_classes=40, normal_channel=True)
        variables = jax.tree_util.tree_map(
            jnp.asarray,
            import_pointnet2_cls(ref.state_dict(), msg=variant == "msg"),
        )
        out, l3 = ours.apply(variables, jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(l3)[:, 0, :],
            ref_l3.numpy().reshape(2, 1024),
            atol=1e-4,
        )


class TestPointNet2PartSegParity:
    """Full-model parity for part segmentation
    (`pointnet2_part_seg_ssg.py:7-52`, `pointnet2_part_seg_msg.py:7-52`):
    covers the one-hot class conditioning, the broadcast l3→l2 FP hop,
    and the full-input l0 feature convention."""

    @pytest.mark.parametrize("variant", ["ssg", "msg"])
    def test_logits_match_reference(self, ref_object_modules, variant):
        from pointsecguard_tpu.models import (
            PointNet2PartSegMSG,
            PointNet2PartSegSSG,
        )
        from pointsecguard_tpu.utils.importers import (
            import_pointnet2_partseg,
        )

        torch.manual_seed(5)
        ref = ref_object_modules[f"part_{variant}"].get_model(
            50, normal_channel=True
        )
        _randomize_bn(ref)
        ref.eval()

        rs = np.random.RandomState(13)
        pts = rs.rand(2, 1024, 6).astype(np.float32)
        one_hot = np.eye(16, dtype=np.float32)[rs.randint(0, 16, size=2)]
        with _zero_randint(), torch.no_grad():
            ref_out, _ = ref(
                torch.from_numpy(pts.transpose(0, 2, 1)),
                torch.from_numpy(one_hot),
            )

        cls = PointNet2PartSegMSG if variant == "msg" else PointNet2PartSegSSG
        ours = cls(num_classes=50, normal_channel=True)
        variables = jax.tree_util.tree_map(
            jnp.asarray,
            import_pointnet2_partseg(ref.state_dict(), msg=variant == "msg"),
        )
        out, _ = ours.apply(variables, jnp.asarray(pts), jnp.asarray(one_hot))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)


def _make_ref_resgcn(arch_mod, nb, c, k):
    opt = types.SimpleNamespace(
        n_filters=c, k=k, act="relu", norm="batch", bias=True,
        epsilon=0.2, stochastic=True, conv="edge", n_blocks=nb,
        in_channels=9, block="res", dropout=0.5, n_classes=13,
    )
    torch.manual_seed(0)
    ref = arch_mod.DenseDeepGCN(opt)
    _randomize_bn(ref)
    ref.eval()
    return ref


class TestResGCNFullModelParity:
    NB, C, K, N = 4, 32, 8, 256

    @pytest.fixture(scope="class")
    def setup(self, ref_resgcn_module):
        from pointsecguard_tpu.models import DenseDeepGCN
        from pointsecguard_tpu.utils.importers import import_resgcn

        ref = _make_ref_resgcn(ref_resgcn_module, self.NB, self.C, self.K)
        pts = np.random.RandomState(7).rand(2, self.N, 9).astype(np.float32)
        x_t = torch.from_numpy(pts.transpose(0, 2, 1))[..., None]
        with torch.no_grad():
            ref_logits = ref(x_t).numpy().transpose(0, 2, 1)
            # the reference's own edge graphs, stage by stage
            # (`architecture.py:59-62`: head knn on xyz, then each
            # backbone block's dynamic knn on the running features)
            graphs = [ref.knn(x_t[:, 0:3])[0].numpy()]
            feats = [ref.head(x_t, ref.knn(x_t[:, 0:3]))]
            for i in range(self.NB - 1):
                body = ref.backbone[i].body
                graphs.append(body.dilated_knn_graph(feats[-1])[0].numpy())
                feats.append(ref.backbone[i](feats[-1]))

        ours = DenseDeepGCN(
            num_classes=13, n_blocks=self.NB, n_filters=self.C, k=self.K,
            block="res", stochastic=True, epsilon=0.2, dropout=0.5,
        )
        variables = jax.tree_util.tree_map(
            jnp.asarray, import_resgcn(ref.state_dict(), n_blocks=self.NB)
        )
        return ours, variables, pts, ref_logits, graphs

    def test_graph_pinned_logits_match(self, setup):
        """With the reference's edge graphs injected, logits match — the
        complete arithmetic (EdgeConv, BasicConv conv→act→norm, fusion
        max-pool, prediction head) and the importer are exact."""
        ours, variables, pts, ref_logits, graphs = setup
        out = ours.apply(
            variables, jnp.asarray(pts),
            graphs=tuple(jnp.asarray(g) for g in graphs),
        )
        np.testing.assert_allclose(np.asarray(out), ref_logits, atol=1e-4)

    def test_end_to_end_predictions_agree(self, setup):
        """Each side computing its own graphs: near-tie neighbor flips in
        feature-space kNN perturb logits slightly (documented chaos), but
        the head graph matches exactly and predictions agree."""
        from pointsecguard_tpu import ops

        ours, variables, pts, ref_logits, graphs = setup
        head = ops.dense_knn_graph(jnp.asarray(pts[..., :3]), self.K)
        np.testing.assert_array_equal(np.asarray(head), graphs[0])

        out = np.asarray(ours.apply(variables, jnp.asarray(pts)))
        assert (out.argmax(-1) == ref_logits.argmax(-1)).mean() >= 0.99
        assert np.abs(out - ref_logits).max() < 0.5


class TestResGCNDenseMRParity:
    """Second architecture point: block='dense' + conv='mr'
    (`architecture.py:27-32`, MRConv2d `torch_vertex.py:8-20`) —
    graph-pinned full-model parity like the res/edge case."""

    NB, C, K, N = 3, 16, 8, 128

    def test_graph_pinned_logits_match(self, ref_resgcn_module):
        from pointsecguard_tpu.models import DenseDeepGCN
        from pointsecguard_tpu.utils.importers import import_resgcn

        opt = types.SimpleNamespace(
            n_filters=self.C, k=self.K, act="relu", norm="batch",
            bias=True, epsilon=0.0, stochastic=True, conv="mr",
            n_blocks=self.NB, in_channels=9, block="dense", dropout=0.0,
            n_classes=13,
        )
        torch.manual_seed(1)
        ref = ref_resgcn_module.DenseDeepGCN(opt)
        _randomize_bn(ref)
        ref.eval()
        pts = np.random.RandomState(9).rand(1, self.N, 9).astype(np.float32)
        x_t = torch.from_numpy(pts.transpose(0, 2, 1))[..., None]
        with torch.no_grad():
            ref_logits = ref(x_t).numpy().transpose(0, 2, 1)
            graphs = [ref.knn(x_t[:, 0:3])[0].numpy()]
            feats = [ref.head(x_t, ref.knn(x_t[:, 0:3]))]
            for i in range(self.NB - 1):
                body = ref.backbone[i].body
                graphs.append(
                    body.dilated_knn_graph(feats[-1])[0].numpy()
                )
                feats.append(ref.backbone[i](feats[-1]))

        ours = DenseDeepGCN(
            num_classes=13, n_blocks=self.NB, n_filters=self.C, k=self.K,
            block="dense", conv="mr", stochastic=True, epsilon=0.0,
        )
        variables = jax.tree_util.tree_map(
            jnp.asarray,
            import_resgcn(ref.state_dict(), n_blocks=self.NB, conv="mr"),
        )
        out = ours.apply(
            variables, jnp.asarray(pts),
            graphs=tuple(jnp.asarray(g) for g in graphs),
        )
        np.testing.assert_allclose(np.asarray(out), ref_logits, atol=1e-4)
