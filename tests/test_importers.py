"""Legacy checkpoint importer tests.

The reference ships no trained weights (verified in round 1), so these
tests construct state dicts with the reference's exact key schema from
standard torch layers, convert them, and assert (a) the converted tree
is structurally identical to our `model.init` tree and loads into
`model.apply`, and (b) layer-level numerics: a torch conv1×1+BN eval
forward equals our PointConv with the converted parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from pointsecguard_tpu.utils.importers import (  # noqa: E402
    import_pointnet2_semseg,
    import_resgcn,
)


def _tree_spec(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


class _SA(nn.Module):
    """`pointnet_util.py:166-178` parameter schema."""

    def __init__(self, cin, outs):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        for o in outs:
            self.mlp_convs.append(nn.Conv2d(cin, o, 1))
            self.mlp_bns.append(nn.BatchNorm2d(o))
            cin = o


class _FP(nn.Module):
    """`pointnet_util.py:270-280` parameter schema (Conv1d)."""

    def __init__(self, cin, outs):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        for o in outs:
            self.mlp_convs.append(nn.Conv1d(cin, o, 1))
            self.mlp_bns.append(nn.BatchNorm1d(o))
            cin = o


class _SAMsg(nn.Module):
    """`pointnet_util.py:210-232` parameter schema (nested per-scale
    conv_blocks/bn_blocks ModuleLists; each scale's first conv sees
    in_channel + 3 rel-xyz)."""

    def __init__(self, cin, mlps):
        super().__init__()
        self.conv_blocks = nn.ModuleList()
        self.bn_blocks = nn.ModuleList()
        for mlp in mlps:
            convs = nn.ModuleList()
            bns = nn.ModuleList()
            last = cin + 3
            for o in mlp:
                convs.append(nn.Conv2d(last, o, 1))
                bns.append(nn.BatchNorm2d(o))
                last = o
            self.conv_blocks.append(convs)
            self.bn_blocks.append(bns)


class _STN(nn.Module):
    """`pointnet.py:10-85` STN3d/STNkd parameter schema."""

    def __init__(self, cin, k):
        super().__init__()
        self.conv1 = nn.Conv1d(cin, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(256)


class _Encoder(nn.Module):
    """`pointnet.py:88-101` PointNetEncoder parameter schema."""

    def __init__(self, channel):
        super().__init__()
        self.stn = _STN(channel, 3)
        self.conv1 = nn.Conv1d(channel, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.fstn = _STN(64, 64)


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.normal_()
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_()
            m.bias.data.normal_()


@pytest.fixture(scope="module")
def ref_semseg_sd():
    """State dict with `pointnet2_sem_seg.py:6-19` key schema."""
    torch.manual_seed(0)
    m = nn.Module()
    m.sa1 = _SA(12, [32, 32, 64])
    m.sa2 = _SA(64 + 3, [64, 64, 128])
    m.sa3 = _SA(128 + 3, [128, 128, 256])
    m.sa4 = _SA(256 + 3, [256, 256, 512])
    m.fp4 = _FP(768, [256, 256])
    m.fp3 = _FP(384, [256, 256])
    m.fp2 = _FP(320, [256, 128])
    m.fp1 = _FP(128, [128, 128, 128])
    m.conv1 = nn.Conv1d(128, 128, 1)
    m.bn1 = nn.BatchNorm1d(128)
    m.conv2 = nn.Conv1d(128, 13, 1)
    _randomize_bn(m)
    return m.state_dict()


class TestPointnet2Import:
    def test_tree_matches_and_loads(self, ref_semseg_sd):
        from pointsecguard_tpu.models import PointNet2SemSegSSG

        converted = import_pointnet2_semseg(
            {"model_state_dict": ref_semseg_sd, "epoch": 7}
        )
        model = PointNet2SemSegSSG(num_classes=13)
        pts = jnp.array(np.random.RandomState(0).rand(1, 64, 9), jnp.float32)
        init = model.init(jax.random.PRNGKey(0), pts)
        assert _tree_spec(converted["params"]) == _tree_spec(init["params"])
        assert (
            _tree_spec(converted["batch_stats"])
            == _tree_spec(init["batch_stats"])
        )
        out, _ = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted), pts
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_layer_numerics_match_torch(self, ref_semseg_sd):
        """torch relu(bn(conv1x1(x))) == our PointConv with converted
        params — validates the kernel transpose + BN mapping end-to-end."""
        from pointsecguard_tpu.models.common import PointConv

        converted = import_pointnet2_semseg(ref_semseg_sd)
        conv = nn.Conv2d(12, 32, 1)
        bn = nn.BatchNorm2d(32)
        conv.load_state_dict({
            "weight": ref_semseg_sd["sa1.mlp_convs.0.weight"],
            "bias": ref_semseg_sd["sa1.mlp_convs.0.bias"],
        })
        bn.load_state_dict({
            "weight": ref_semseg_sd["sa1.mlp_bns.0.weight"],
            "bias": ref_semseg_sd["sa1.mlp_bns.0.bias"],
            "running_mean": ref_semseg_sd["sa1.mlp_bns.0.running_mean"],
            "running_var": ref_semseg_sd["sa1.mlp_bns.0.running_var"],
            "num_batches_tracked": torch.tensor(0),
        })
        bn.eval()
        x = torch.randn(2, 12, 8, 16)  # [B, C, K, N]
        with torch.no_grad():
            y_ref = torch.relu(bn(conv(x))).numpy()

        pc = PointConv(32)
        leaf = converted["params"]["SetAbstraction_0"]["PointMLP_0"][
            "PointConv_0"]
        stats = converted["batch_stats"]["SetAbstraction_0"]["PointMLP_0"][
            "PointConv_0"]
        variables = {
            "params": {"Dense_0": leaf["Dense_0"],
                       "BatchNorm_0": leaf["BatchNorm_0"]},
            "batch_stats": stats,
        }
        x_lastc = jnp.array(x.numpy().transpose(0, 3, 2, 1))  # [B,N,K,C]
        y = pc.apply(jax.tree_util.tree_map(jnp.asarray, variables), x_lastc)
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 2, 1), y_ref, atol=2e-5
        )


class TestResgcnImport:
    def test_tree_matches_and_loads(self):
        from pointsecguard_tpu.models import DenseDeepGCN

        torch.manual_seed(1)
        NB, C = 4, 64

        def basic(cin, cout, act=True, norm=True):
            mods = [nn.Conv2d(cin, cout, 1)]
            if act:
                mods.append(nn.LeakyReLU(0.2))
            if norm:
                mods.append(nn.BatchNorm2d(cout))
            return nn.Sequential(*mods)

        def gconv(cin, cout):
            g = nn.Module()
            g.gconv = nn.Module()
            g.gconv.nn = basic(cin * 2, cout)
            return g

        m = nn.Module()
        m.head = gconv(9, C)
        body_list = []
        for _ in range(NB - 1):
            blk = nn.Module()
            blk.body = gconv(C, C)
            body_list.append(blk)
        m.backbone = nn.Sequential(*body_list)
        fusion_in = C + C * (NB - 1)
        m.fusion_block = basic(fusion_in, 1024)
        m.prediction = nn.Sequential(
            basic(fusion_in + 1024, 512),
            basic(512, 256),
            nn.Dropout(),
            basic(256, 13, act=False, norm=False),
        )
        _randomize_bn(m)
        sd = {"module." + k: v for k, v in m.state_dict().items()}

        converted = import_resgcn({"state_dict": sd}, n_blocks=NB)
        model = DenseDeepGCN(n_blocks=NB, n_filters=C, k=4)
        pts = jnp.array(np.random.RandomState(0).rand(1, 32, 9), jnp.float32)
        init = model.init(jax.random.PRNGKey(0), pts)
        assert _tree_spec(converted["params"]) == _tree_spec(init["params"])
        assert (
            _tree_spec(converted["batch_stats"])
            == _tree_spec(init["batch_stats"])
        )
        logits = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted), pts
        )
        assert np.isfinite(np.asarray(logits)).all()


class TestImportCLI:
    def test_import_then_eval(self, ref_semseg_sd, tmp_path):
        """reference .pth → cli.import_ckpt → cli.eval restores and runs."""
        from pointsecguard_tpu.cli import import_ckpt
        from pointsecguard_tpu.cli import eval as eval_cli
        from pointsecguard_tpu.data import make_synthetic_rooms

        pth = str(tmp_path / "best_model.pth")
        torch.save(
            {"model_state_dict": ref_semseg_sd, "epoch": 42}, pth
        )
        log = str(tmp_path / "imported")
        import_ckpt.main([
            "--model", "pointnet2", "--ckpt", pth, "--log_dir", log,
            "--num_point", "64",
        ])
        data = str(tmp_path / "data")
        make_synthetic_rooms(data, points_per_room=2000, seed=5)
        total = eval_cli.main([
            "--model", "pointnet2", "--data_root", data, "--log_dir", log,
            "--num_point", "64", "--batch_size", "4", "--num_votes", "1",
        ])
        # untrained random-but-valid weights: metrics exist and are sane
        assert 0.0 <= float(total.accuracy) <= 1.0

    def test_import_pointnet_semseg_cli(self, tmp_path):
        """PointNet semseg .pth import: STN/encoder schema + with_rgb
        and num_class inference (`pointnet_sem_seg.py:9-24`)."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(7)
        m = nn.Module()
        m.feat = _Encoder(6)
        m.conv1 = nn.Conv1d(1088, 512, 1)
        m.conv2 = nn.Conv1d(512, 256, 1)
        m.conv3 = nn.Conv1d(256, 128, 1)
        m.conv4 = nn.Conv1d(128, 13, 1)
        m.bn1 = nn.BatchNorm1d(512)
        m.bn2 = nn.BatchNorm1d(256)
        m.bn3 = nn.BatchNorm1d(128)
        _randomize_bn(m)
        pth = str(tmp_path / "pn.pth")
        torch.save({"model_state_dict": m.state_dict(), "epoch": 1}, pth)
        state = import_ckpt.main([
            "--model", "pointnet", "--ckpt", pth,
            "--log_dir", str(tmp_path / "imp_pn"), "--num_point", "64",
        ])
        assert state.params["Dense_0"]["kernel"].shape == (128, 13)

    def test_import_pointnet_partseg_cli(self, tmp_path):
        """PointNet part-seg .pth import: conv1-5 + convs1-4 + fstn(128)
        schema, part_num/normal inference (`pointnet_part_seg.py:9-36`)."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(8)
        m = nn.Module()
        m.stn = _STN(6, 3)
        m.fstn = _STN(128, 128)
        for i, (cin, cout) in enumerate(
            [(6, 64), (64, 128), (128, 128), (128, 512), (512, 2048)]
        ):
            setattr(m, f"conv{i + 1}", nn.Conv1d(cin, cout, 1))
            setattr(m, f"bn{i + 1}", nn.BatchNorm1d(cout))
        for i, (cin, cout) in enumerate([(4944, 256), (256, 256),
                                         (256, 128)]):
            setattr(m, f"convs{i + 1}", nn.Conv1d(cin, cout, 1))
            setattr(m, f"bns{i + 1}", nn.BatchNorm1d(cout))
        m.convs4 = nn.Conv1d(128, 50, 1)
        _randomize_bn(m)
        pth = str(tmp_path / "pnp.pth")
        torch.save({"model_state_dict": m.state_dict(), "epoch": 1}, pth)
        state = import_ckpt.main([
            "--model", "pointnet_part_seg", "--ckpt", pth,
            "--log_dir", str(tmp_path / "imp_pnp"), "--num_point", "64",
        ])
        assert state.params["Dense_0"]["kernel"].shape == (128, 50)

    def test_import_semseg_msg_cli(self, tmp_path):
        """MSG semseg .pth import through the CLI
        (`pointnet2_sem_seg_msg.py:10-21` specs)."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(9)
        m = nn.Module()
        m.sa1 = _SAMsg(9, [[16, 16, 32], [32, 32, 64]])
        m.sa2 = _SAMsg(96, [[64, 64, 128], [64, 96, 128]])
        m.sa3 = _SAMsg(256, [[128, 196, 256], [128, 196, 256]])
        m.sa4 = _SAMsg(512, [[256, 256, 512], [256, 384, 512]])
        m.fp4 = _FP(1536, [256, 256])
        m.fp3 = _FP(512, [256, 256])
        m.fp2 = _FP(352, [256, 128])
        m.fp1 = _FP(128, [128, 128, 128])
        m.conv1 = nn.Conv1d(128, 128, 1)
        m.bn1 = nn.BatchNorm1d(128)
        m.conv2 = nn.Conv1d(128, 13, 1)
        _randomize_bn(m)
        pth = str(tmp_path / "msg.pth")
        torch.save({"model_state_dict": m.state_dict(), "epoch": 1}, pth)
        state = import_ckpt.main([
            "--model", "pointnet2_msg", "--ckpt", pth,
            "--log_dir", str(tmp_path / "imp_msg"), "--num_point", "64",
        ])
        assert state.params["Dense_0"]["kernel"].shape == (128, 13)

    def test_import_cls_msg_cli(self, tmp_path):
        """cls-MSG .pth import: MSG conv_blocks schema + num_class /
        normal_channel shape inference (`pointnet2_cls_msg.py:8-21`)."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(4)
        m = nn.Module()
        m.sa1 = _SAMsg(3, [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
        m.sa2 = _SAMsg(320, [[64, 64, 128], [128, 128, 256],
                             [128, 128, 256]])
        m.sa3 = _SA(640 + 3, [256, 512, 1024])
        m.fc1 = nn.Linear(1024, 512)
        m.bn1 = nn.BatchNorm1d(512)
        m.fc2 = nn.Linear(512, 256)
        m.bn2 = nn.BatchNorm1d(256)
        m.fc3 = nn.Linear(256, 40)
        _randomize_bn(m)
        pth = str(tmp_path / "cls.pth")
        torch.save({"model_state_dict": m.state_dict(), "epoch": 5}, pth)
        log = str(tmp_path / "imp_cls")
        state = import_ckpt.main([
            "--model", "pointnet2_cls_msg", "--ckpt", pth,
            "--log_dir", log, "--num_point", "64",
        ])
        # inferred num_class=40, normal_channel=True (first conv in=6)
        head = state.params["_ClsHead_0"]
        assert head["Dense_2"]["kernel"].shape == (256, 40)

    def test_import_partseg_ssg_cli(self, tmp_path):
        """part-seg SSG .pth import: FP chain + one-hot skip channel
        arithmetic + shape inference (`pointnet2_part_seg_ssg.py:10-24`)."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(6)
        m = nn.Module()
        m.sa1 = _SA(9, [64, 64, 128])
        m.sa2 = _SA(128 + 3, [128, 128, 256])
        m.sa3 = _SA(256 + 3, [256, 512, 1024])
        m.fp3 = _FP(1280, [256, 256])
        m.fp2 = _FP(384, [256, 128])
        m.fp1 = _FP(128 + 16 + 6 + 3, [128, 128, 128])
        m.conv1 = nn.Conv1d(128, 128, 1)
        m.bn1 = nn.BatchNorm1d(128)
        m.conv2 = nn.Conv1d(128, 50, 1)
        _randomize_bn(m)
        pth = str(tmp_path / "part.pth")
        torch.save({"model_state_dict": m.state_dict(), "epoch": 5}, pth)
        log = str(tmp_path / "imp_part")
        state = import_ckpt.main([
            "--model", "pointnet2_part_seg_ssg", "--ckpt", pth,
            "--log_dir", log, "--num_point", "64",
        ])
        assert state.params["Dense_0"]["kernel"].shape == (128, 50)

    def test_import_resgcn_cli(self, tmp_path):
        """ResGCN .pth import through the CLI writes a restorable ckpt."""
        from pointsecguard_tpu.cli import import_ckpt

        torch.manual_seed(2)
        NB, C = 3, 64

        def basic(cin, cout, act=True, norm=True):
            mods = [nn.Conv2d(cin, cout, 1)]
            if act:
                mods.append(nn.LeakyReLU(0.2))
            if norm:
                mods.append(nn.BatchNorm2d(cout))
            return nn.Sequential(*mods)

        def gconv(cin, cout):
            g = nn.Module()
            g.gconv = nn.Module()
            g.gconv.nn = basic(cin * 2, cout)
            return g

        m = nn.Module()
        m.head = gconv(9, C)
        body = []
        for _ in range(NB - 1):
            blk = nn.Module()
            blk.body = gconv(C, C)
            body.append(blk)
        m.backbone = nn.Sequential(*body)
        fusion_in = C + C * (NB - 1)
        m.fusion_block = basic(fusion_in, 1024)
        m.prediction = nn.Sequential(
            basic(fusion_in + 1024, 512), basic(512, 256), nn.Dropout(),
            basic(256, 13, act=False, norm=False),
        )
        pth = str(tmp_path / "_ckpt_best.pth")
        torch.save({"state_dict": m.state_dict(), "epoch": 3}, pth)
        log = str(tmp_path / "imp")
        state = import_ckpt.main([
            "--model", "resgcn", "--ckpt", pth, "--log_dir", log,
            "--resgcn_blocks", str(NB), "--num_point", "64",
        ])
        import os

        assert os.path.isdir(os.path.join(log, "checkpoints"))
        assert state.params["BasicConv_0"]["Dense_0"]["kernel"].shape[1] == 1024


def _synthetic_randla_tf_ckpt(rng, d_in=6, num_classes=13,
                              d_out=(16, 64, 128, 256, 512),
                              with_adam_slots=False):
    """A {tf_var_name: array} dict with the fork's exact variable schema,
    derived statically from the graph definition (`RandLANet.py:150-190,
    323-344,398-410` + `helper_tf_util.py:115-170,184-212`): conv2d
    kernels are [1,1,in,out], conv2d_transpose kernels are REVERSED
    [1,1,out,in], every bn=True conv owns an unnamed BN scope."""
    names = {}

    def dense(scope, cin, cout, bias=True):
        names[f"{scope}/kernel"] = rng.randn(cin, cout).astype(np.float32)
        if bias:
            names[f"{scope}/bias"] = rng.randn(cout).astype(np.float32)

    def bn(scope, c):
        pre = f"{scope}/" if scope else ""
        names[f"{pre}batch_normalization/gamma"] = rng.rand(c).astype(
            np.float32) + 0.5
        names[f"{pre}batch_normalization/beta"] = rng.randn(c).astype(
            np.float32)
        names[f"{pre}batch_normalization/moving_mean"] = rng.randn(c).astype(
            np.float32)
        names[f"{pre}batch_normalization/moving_variance"] = (
            rng.rand(c).astype(np.float32) + 0.5)

    def conv(scope, cin, cout, with_bn=True, transpose=False):
        shape = (1, 1, cout, cin) if transpose else (1, 1, cin, cout)
        names[f"{scope}/weights"] = rng.randn(*shape).astype(np.float32)
        names[f"{scope}/biases"] = rng.randn(cout).astype(np.float32)
        if with_bn:
            bn(scope, cout)

    dense("fc0", d_in, 8)
    bn("", 8)
    f_in = 8
    for i, d in enumerate(d_out):
        E = f"Encoder_layer_{i}"
        conv(f"{E}mlp1", f_in, d // 2)
        conv(f"{E}LFAmlp1", 10, d // 2)
        dense(f"{E}LFAatt_pooling_1fc", d, d, bias=False)
        conv(f"{E}LFAatt_pooling_1mlp", d, d // 2)
        conv(f"{E}LFAmlp2", d // 2, d // 2)
        dense(f"{E}LFAatt_pooling_2fc", d, d, bias=False)
        conv(f"{E}LFAatt_pooling_2mlp", d, d)
        conv(f"{E}mlp2", d, 2 * d)
        conv(f"{E}shortcut", f_in, 2 * d)
        f_in = 2 * d
    enc_dims = [2 * d_out[0]] + [2 * d for d in d_out]
    conv("decoder_0", enc_dims[-1], enc_dims[-1])
    f = enc_dims[-1]
    for j in range(len(d_out)):
        out = enc_dims[-j - 2]
        conv(f"Decoder_layer_{j}", out + f, out, transpose=True)
        f = out
    conv("fc1", f, 64)
    conv("fc2", 64, 32)
    conv("fc", 32, num_classes, with_bn=False)
    if with_adam_slots:
        for k in [k for k in names if k.endswith(("kernel", "weights"))][:5]:
            names[f"{k}/Adam"] = np.zeros_like(names[k])
            names[f"{k}/Adam_1"] = np.zeros_like(names[k])
        names["optimizer/learning_rate"] = np.float32(0.01)
        names["beta1_power"] = np.float32(0.9)
    return names


class TestRandlaTFImport:
    def test_tree_matches_and_loads(self):
        """Synthetic schema-conforming snapshot → flax tree: structure
        matches model.init and the model runs on a real pyramid."""
        from pointsecguard_tpu.models import RandLANet, build_pyramid
        from pointsecguard_tpu.utils.importers import map_randla_vars

        rng = np.random.RandomState(11)
        arrays = _synthetic_randla_tf_ckpt(rng, with_adam_slots=True)
        converted = map_randla_vars(arrays)

        model = RandLANet(num_classes=13)
        xyz = jnp.array(np.random.RandomState(0).rand(1, 512, 3), jnp.float32)
        feats = jnp.array(
            np.random.RandomState(1).rand(1, 512, 6), jnp.float32
        )
        pyr = build_pyramid(xyz, knn_tile=None)
        init = model.init(jax.random.PRNGKey(0), feats, pyr)
        assert _tree_spec(converted["params"]) == _tree_spec(init["params"])
        assert (
            _tree_spec(converted["batch_stats"])
            == _tree_spec(init["batch_stats"])
        )
        logits = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted), feats, pyr
        )
        assert logits.shape == (1, 512, 13)
        assert np.isfinite(np.asarray(logits)).all()

    def test_transpose_conv_orientation(self):
        """Decoder_layer kernels are [1,1,out,in] (`helper_tf_util.py:
        210-212`): the mapped PointConv must compute
        leaky_relu(bn(x @ W[0,0].T + b))."""
        from pointsecguard_tpu.models.common import PointConv
        from pointsecguard_tpu.utils.importers import map_randla_vars

        rng = np.random.RandomState(3)
        arrays = _synthetic_randla_tf_ckpt(rng)
        converted = map_randla_vars(arrays)
        p = converted["params"]["PointConv_1"]  # Decoder_layer_0
        s = converted["batch_stats"]["PointConv_1"]

        w = arrays["Decoder_layer_0/weights"][0, 0]  # [out=512, in=1536]
        b = arrays["Decoder_layer_0/biases"]
        x = rng.randn(2, 7, w.shape[1]).astype(np.float32)
        y = x @ w.T + b
        g = arrays["Decoder_layer_0/batch_normalization/gamma"]
        be = arrays["Decoder_layer_0/batch_normalization/beta"]
        mu = arrays["Decoder_layer_0/batch_normalization/moving_mean"]
        var = arrays["Decoder_layer_0/batch_normalization/moving_variance"]
        y = (y - mu) / np.sqrt(var + 1e-6) * g + be
        want = np.where(y > 0, y, 0.2 * y)  # helper_tf_util.py:249

        pc = PointConv(w.shape[0], act="leaky_relu", bn_epsilon=1e-6)
        got = pc.apply(
            jax.tree_util.tree_map(
                jnp.asarray, {"params": p, "batch_stats": s}
            ),
            jnp.asarray(x),
        )
        # 1536-wide float32 reductions: numpy vs XLA accumulation order
        # differs, so tolerance is relative (orientation errors would
        # mismatch everything by O(1))
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                                   atol=1e-3)

    def test_unmatched_variables_raise(self):
        from pointsecguard_tpu.utils.importers import map_randla_vars

        rng = np.random.RandomState(5)
        arrays = _synthetic_randla_tf_ckpt(rng)
        # missing model variable → clear error naming it
        broken = dict(arrays)
        del broken["fc1/weights"]
        with pytest.raises(ValueError, match="fc1/weights"):
            map_randla_vars(broken)
        # extra unrecognized model variable → listed
        extra = dict(arrays)
        extra["Encoder_layer_9mlp1/weights"] = np.zeros((1, 1, 4, 4),
                                                        np.float32)
        with pytest.raises(ValueError, match="Encoder_layer_9mlp1"):
            map_randla_vars(extra)


class TestRandlaImportCLI:
    def test_import_randla_npz_cli(self, tmp_path):
        """.npz TF-variable dump → cli.import_ckpt --model randla writes
        a restorable checkpoint with the converted weights."""
        from pointsecguard_tpu.cli import import_ckpt

        rng = np.random.RandomState(13)
        arrays = _synthetic_randla_tf_ckpt(rng, with_adam_slots=True)
        npz = str(tmp_path / "snap.npz")
        np.savez(npz, **arrays)
        log = str(tmp_path / "imp")
        state = import_ckpt.main([
            "--model", "randla", "--ckpt", npz, "--log_dir", log,
            "--num_point", "512",
        ])
        import os

        assert os.path.isdir(os.path.join(log, "checkpoints"))
        # fc0 kernel made it through verbatim
        np.testing.assert_allclose(
            np.asarray(state.params["Dense_0"]["kernel"]),
            arrays["fc0/kernel"], atol=0,
        )
