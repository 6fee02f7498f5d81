"""Weight converter + full-model golden-activation parity vs torch oracles.

The oracle models are built here in torch with the reference's module
naming (layerX.N.convY, deconv_layers.K, duc_layers.K, se.fc.N,
stageS.M.branches/fuse_layers, transitionT...), random weights, eval mode.
Converting their state_dicts into the flax models must reproduce the
forward activations to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from torch import nn

from simple_pose_tpu.convert.torch2flax import convert_torch_state, merge_converted
from simple_pose_tpu.models.resnet import PoseResNet
from simple_pose_tpu.models.hrnet import PoseHRNet


def _seed_all():
    torch.manual_seed(0)


# ---------------------------------------------------------------- torch oracles
class TBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, reduction=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        if reduction:
            self.se = nn.Module()
            self.se.fc = nn.Sequential(
                nn.Conv2d(planes, planes, 1), nn.ReLU(), nn.Conv2d(planes, planes, 1), nn.Sigmoid()
            )
        self.reduc = reduction

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.reduc:
            out = out * self.se.fc(out.mean(dim=(2, 3), keepdim=True))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, reduction=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        if reduction:
            self.se = nn.Module()
            self.se.fc = nn.Sequential(
                nn.Conv2d(planes * 4, planes * 4, 1), nn.ReLU(), nn.Conv2d(planes * 4, planes * 4, 1), nn.Sigmoid()
            )
        self.reduc = reduction

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.reduc:
            out = out * self.se.fc(out.mean(dim=(2, 3), keepdim=True))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


class TPoseResNet(nn.Module):
    """Reference-topology pose resnet (any layer counts), dconv or duc head."""

    def __init__(self, block, layers, head="dconv", num_joints=5, reduction=False):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0], 1, reduction)
        self.layer2 = self._make_layer(block, 128, layers[1], 2, reduction)
        self.layer3 = self._make_layer(block, 256, layers[2], 2, reduction)
        self.layer4 = self._make_layer(block, 512, layers[3], 2, reduction)
        self.head = head
        if head == "dconv":
            mods = []
            for _ in range(3):
                mods += [nn.ConvTranspose2d(self.inplanes, 256, 4, 2, 1, bias=False),
                         nn.BatchNorm2d(256), nn.ReLU()]
                self.inplanes = 256
            self.deconv_layers = nn.Sequential(*mods)
            self.final_layer = nn.Conv2d(256, num_joints, 1)
        else:
            self.duc_layers = nn.Sequential(
                nn.PixelShuffle(2),
                self._duc(self.inplanes // 4, 1024),
                self._duc(256, 512),
            )
            self.final_layer = nn.Conv2d(128, num_joints, 3, padding=1)

    @staticmethod
    def _duc(inp, planes):
        m = nn.Module()
        m.conv = nn.Conv2d(inp, planes, 3, padding=1, bias=False)
        m.bn = nn.BatchNorm2d(planes)
        m.forward = lambda x, m=m: nn.functional.pixel_shuffle(torch.relu(m.bn(m.conv(x))), 2)
        return m

    def _make_layer(self, block, planes, blocks, stride, reduction):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample, reduction if downsample is not None else False)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.deconv_layers(x) if self.head == "dconv" else self.duc_layers(x)
        return self.final_layer(x)


def _randomize_bn_stats(model):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)


def _compare(tmodel, fmodel, x_nhwc, family, atol):
    tmodel.eval()
    converted, skipped = convert_torch_state(tmodel.state_dict(), family)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))
    merged, missing, unexpected = merge_converted(variables, converted)
    assert not missing, f"missing: {missing[:5]}"
    assert not unexpected, f"unexpected: {unexpected[:5]}"
    got = np.asarray(fmodel.apply(merged, jnp.asarray(x_nhwc)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, ref, atol=atol)


@pytest.mark.parametrize("block,flax_block,reduction", [
    (TBasicBlock, "basic", False),
    (TBasicBlock, "basic", True),
    (TBottleneck, "bottleneck", True),
])
def test_resnet_dconv_parity(block, flax_block, reduction):
    _seed_all()
    rng = np.random.default_rng(0)
    t = TPoseResNet(block, (1, 1, 1, 1), "dconv", num_joints=5, reduction=reduction)
    _randomize_bn_stats(t)
    f = PoseResNet(block=flax_block, layers=(1, 1, 1, 1), head="dconv", num_joints=5, se=reduction)
    x = rng.normal(size=(2, 64, 48, 3)).astype(np.float32)
    _compare(t, f, x, "resnet", atol=2e-4)


def test_resnet_duc_parity():
    _seed_all()
    rng = np.random.default_rng(1)
    t = TPoseResNet(TBottleneck, (1, 1, 1, 1), "duc", num_joints=5, reduction=False)
    _randomize_bn_stats(t)
    f = PoseResNet(block="bottleneck", layers=(1, 1, 1, 1), head="duc", num_joints=5, se=False)
    x = rng.normal(size=(1, 64, 48, 3)).astype(np.float32)
    _compare(t, f, x, "resnet", atol=2e-4)


# ------------------------------------------------------------- HRNet oracle
class THRModule(nn.Module):
    """HighResolutionModule oracle (pose_hrnet.py:95-259 semantics)."""

    def __init__(self, channels, num_blocks, multi_scale=True):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList()
        for b in range(n):
            blocks = [TBasicBlock(channels[b], channels[b]) for _ in range(num_blocks)]
            self.branches.append(nn.Sequential(*blocks))
        fuse_layers = []
        for i in range(n if multi_scale else 1):
            row = []
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i]),
                        nn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                    ))
                elif j == i:
                    row.append(nn.Identity())
                else:
                    seq = []
                    for k in range(i - j):
                        out_ch = channels[i] if k == i - j - 1 else channels[j]
                        mods = [nn.Conv2d(channels[j], out_ch, 3, 2, 1, bias=False), nn.BatchNorm2d(out_ch)]
                        if k != i - j - 1:
                            mods.append(nn.ReLU(True))
                        seq.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*seq))
            fuse_layers.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse_layers)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i, row in enumerate(self.fuse_layers):
            y = None
            for j, m in enumerate(row):
                t = xs[j] if j == i else m(xs[j])
                y = t if y is None else y + t
            outs.append(torch.relu(y))
        return outs


class THRNet(nn.Module):
    def __init__(self, c=4, num_joints=3):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False), nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(TBottleneck(64, 64, 1, ds), TBottleneck(256, 64))
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(256, c, 3, 1, 1, bias=False), nn.BatchNorm2d(c), nn.ReLU(True)),
            nn.Sequential(nn.Sequential(nn.Conv2d(256, 2 * c, 3, 2, 1, bias=False), nn.BatchNorm2d(2 * c), nn.ReLU(True))),
        ])
        self.stage2 = nn.Sequential(THRModule([c, 2 * c], 2))
        self.transition2 = nn.ModuleList([
            nn.Identity(), nn.Identity(),
            nn.Sequential(nn.Sequential(nn.Conv2d(2 * c, 4 * c, 3, 2, 1, bias=False), nn.BatchNorm2d(4 * c), nn.ReLU(True))),
        ])
        self.stage3 = nn.Sequential(THRModule([c, 2 * c, 4 * c], 2), THRModule([c, 2 * c, 4 * c], 2, multi_scale=False))
        self.final_layer = nn.Conv2d(c, num_joints, 1)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = self.stage2(xs)
        xs = [xs[0], xs[1], self.transition2[2](xs[-1])]
        for m in self.stage3:
            xs = m(xs)
        return self.final_layer(xs[0])


def test_hrnet_parity():
    _seed_all()
    rng = np.random.default_rng(2)
    t = THRNet(c=4, num_joints=3)
    _randomize_bn_stats(t)
    cfg = {
        "FINAL_CONV_KERNEL": 1,
        "LAYER1_NUM_BLOCKS": 2,
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [2, 2], "NUM_CHANNELS": [4, 8], "FUSE_METHOD": "SUM"},
        "STAGE3": {"NUM_MODULES": 2, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [2, 2, 2], "NUM_CHANNELS": [4, 8, 16], "FUSE_METHOD": "SUM"},
    }
    # the flax model treats the last stage in the dict as STAGE4-style
    # (multi_scale_output False on its last module); rename for the 2-stage oracle
    cfg["STAGE4"] = cfg.pop("STAGE3")
    f = PoseHRNet(cfg=cfg, num_joints=3)
    x = rng.normal(size=(1, 64, 48, 3)).astype(np.float32)

    t.eval()
    converted, skipped = convert_torch_state(
        {k.replace("stage3", "stage4").replace("transition2", "transition3"): v
         for k, v in t.state_dict().items()},
        "hrnet",
    )
    variables = f.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged, missing, unexpected = merge_converted(variables, converted)
    assert not missing, f"missing: {missing[:8]}"
    assert not unexpected, f"unexpected: {unexpected[:8]}"
    got = np.asarray(f.apply(merged, jnp.asarray(x)))
    with torch.no_grad():
        ref = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, ref, atol=2e-4)
