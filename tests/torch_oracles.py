"""Hand-written torch reference models for golden-logit converter tests.

These are independent reimplementations (in torch) of the canonical
architectures the torch-format converters claim to ingest — torchvision
resnet/resnext naming + semantics, Cadene/pretrainedmodels senet naming +
semantics (SURVEY.md §2b row 1).  ``state_dict()`` of each module emits
exactly the key layout the converters parse, and the forward pass is the
canonical one, so converting the state dict into the Flax encoder and
comparing feature taps catches transposition, ordering, stride-placement,
and BN-epsilon bugs that shape-only round-trip tests cannot.

Padding note: the Flax encoders use XLA SAME padding while torch pads
symmetrically.  At *odd* spatial extents the two coincide exactly, so the
golden tests run at 65x65 (65→33→17→9→5→3: odd at every stride-2 level).
"""

import torch
import torch.nn as nn


class SEModule(nn.Module):
    """Cadene-style SE: conv-1x1 fc1/fc2, ReLU hidden, reduction 16."""

    def __init__(self, ch: int, red: int = 16):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, max(ch // red, 1), 1)
        self.fc2 = nn.Conv2d(max(ch // red, 1), ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1, se=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if se:
            self.se_module = SEModule(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if hasattr(self, "se_module"):
            y = self.se_module(y)
        return torch.relu(y + r)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck (stride on the 3x3) by default;
    ``stride_on_conv1=True`` reproduces Cadene's SEResNetBottleneck quirk
    (stride on the first 1x1)."""

    def __init__(self, cin, planes, stride=1, se=False, groups=1,
                 width_factor=1, stride_on_conv1=False):
        super().__init__()
        inner = planes * width_factor
        s1, s2 = (stride, 1) if stride_on_conv1 else (1, stride)
        self.conv1 = nn.Conv2d(cin, inner, 1, s1, bias=False)
        self.bn1 = nn.BatchNorm2d(inner)
        self.conv2 = nn.Conv2d(inner, inner, 3, s2, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(inner)
        self.conv3 = nn.Conv2d(inner, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if se:
            self.se_module = SEModule(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if hasattr(self, "se_module"):
            y = self.se_module(y)
        return torch.relu(y + r)


class TorchResNet(nn.Module):
    """Feature-pyramid resnet with torchvision state-dict naming.  Returns
    the [C1..C5] taps the Flax encoders emit (stride 2/4/8/16/32)."""

    def __init__(self, stage_sizes, bottleneck=False, se=False, groups=1,
                 width_factor=1, stride_on_conv1=False, width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = width
        for stage, n in enumerate(stage_sizes):
            planes = width * (2 ** stage)
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                if bottleneck:
                    blocks.append(Bottleneck(
                        cin, planes, stride, se=se, groups=groups,
                        width_factor=width_factor,
                        stride_on_conv1=stride_on_conv1))
                    cin = planes * 4
                else:
                    blocks.append(BasicBlock(cin, planes, stride, se=se))
                    cin = planes
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        feats = [y]
        y = self.maxpool(y)
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
            feats.append(y)
        return feats


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Give every parameter AND BN running stat a non-trivial seeded value
    so identity-stat bugs (e.g. unconverted running_var) fail loudly."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
                # sub-unit BN scale keeps activations O(1) through 50 layers
                # so the golden comparison's rtol is meaningful (fp32
                # accumulation differences, not magnitude blow-up)
                m.weight.copy_(
                    torch.rand(m.weight.shape, generator=g) * 0.4 + 0.3)
                m.bias.copy_(
                    torch.randn(m.bias.shape, generator=g) * 0.1)


# ---------------------------------------------------------------------------
# Inception family (torchvision inception_v3 / timm inception_resnet_v2
# naming).  Padding note: the canonical nets use VALID padding in stems and
# reductions; the Flax encoders use SAME (documented deviation in
# models/encoders/inception.py), so these oracles pad symmetrically (k//2)
# everywhere — at odd extents that IS XLA SAME, and the state-dict layout
# (what the converters parse) is unchanged.
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + ReLU — torchvision/timm naming."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        if isinstance(k, int):
            k = (k, k)
        pad = (k[0] // 2, k[1] // 2)
        self.conv = nn.Conv2d(cin, cout, k, stride, pad, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


def _avg3(x):
    return torch.nn.functional.avg_pool2d(x, 3, 1, 1)


class IncA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, 1)
        self.branch5x5_1 = BasicConv2d(cin, 48, 1)
        self.branch5x5_2 = BasicConv2d(48, 64, 5)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, 3)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, 3)
        self.branch_pool = BasicConv2d(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg3(x))], 1)


class IncRedA(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, 3, 2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, 3)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, 2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            torch.nn.functional.max_pool2d(x, 3, 2, 1)], 1)


class IncB(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, 1)
        self.branch7x7_1 = BasicConv2d(cin, c7, 1)
        self.branch7x7_2 = BasicConv2d(c7, c7, (1, 7))
        self.branch7x7_3 = BasicConv2d(c7, 192, (7, 1))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, 1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, (7, 1))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, (1, 7))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, (7, 1))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, (1, 7))
        self.branch_pool = BasicConv2d(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class IncRedB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, 1)
        self.branch3x3_2 = BasicConv2d(192, 320, 3, 2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, 1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, (1, 7))
        self.branch7x7x3_3 = BasicConv2d(192, 192, (7, 1))
        self.branch7x7x3_4 = BasicConv2d(192, 192, 3, 2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            torch.nn.functional.max_pool2d(x, 3, 2, 1)], 1)


class IncE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, 1)
        self.branch3x3_1 = BasicConv2d(cin, 384, 1)
        self.branch3x3_2a = BasicConv2d(384, 384, (1, 3))
        self.branch3x3_2b = BasicConv2d(384, 384, (3, 1))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, 1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, 3)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, (1, 3))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, (3, 1))
        self.branch_pool = BasicConv2d(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        return torch.cat([
            self.branch1x1(x), self.branch3x3_2a(b3), self.branch3x3_2b(b3),
            self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd),
            self.branch_pool(_avg3(x))], 1)


class TorchInceptionV3(nn.Module):
    """torchvision ``inception_v3`` state-dict layout, [C1..C5] taps."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, 3, 2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, 3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, 3)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, 1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, 3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncRedA(288)
        self.Mixed_6b = IncB(768, 128)
        self.Mixed_6c = IncB(768, 160)
        self.Mixed_6d = IncB(768, 160)
        self.Mixed_6e = IncB(768, 192)
        self.Mixed_7a = IncRedB(768)
        self.Mixed_7b = IncE(1280)
        self.Mixed_7c = IncE(2048)

    def forward(self, x):
        mp = lambda t: torch.nn.functional.max_pool2d(t, 3, 2, 1)  # noqa
        y = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        feats = [y]
        y = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(mp(y)))
        feats.append(y)
        y = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(mp(y))))
        feats.append(y)
        y = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(y)))))
        feats.append(y)
        y = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(y)))
        feats.append(y)
        return feats


class IRMixed5b(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(192, 96, 1)
        self.branch1 = nn.Sequential(BasicConv2d(192, 48, 1),
                                     BasicConv2d(48, 64, 5))
        self.branch2 = nn.Sequential(BasicConv2d(192, 64, 1),
                                     BasicConv2d(64, 96, 3),
                                     BasicConv2d(96, 96, 3))
        self.branch3 = nn.Sequential(
            nn.AvgPool2d(3, 1, 1, count_include_pad=False),
            BasicConv2d(192, 64, 1))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], 1)


class IRBlock35(nn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(320, 32, 1)
        self.branch1 = nn.Sequential(BasicConv2d(320, 32, 1),
                                     BasicConv2d(32, 32, 3))
        self.branch2 = nn.Sequential(BasicConv2d(320, 32, 1),
                                     BasicConv2d(32, 48, 3),
                                     BasicConv2d(48, 64, 3))
        self.conv2d = nn.Conv2d(128, 320, 1)

    def forward(self, x):
        up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x),
                                    self.branch2(x)], 1))
        return torch.relu(x + self.scale * up)


class IRMixed6a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(320, 384, 3, 2)
        self.branch1 = nn.Sequential(BasicConv2d(320, 256, 1),
                                     BasicConv2d(256, 256, 3),
                                     BasicConv2d(256, 384, 3, 2))
        self.branch2 = nn.MaxPool2d(3, 2, 1)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x)], 1)


class IRBlock17(nn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(1088, 192, 1)
        self.branch1 = nn.Sequential(BasicConv2d(1088, 128, 1),
                                     BasicConv2d(128, 160, (1, 7)),
                                     BasicConv2d(160, 192, (7, 1)))
        self.conv2d = nn.Conv2d(384, 1088, 1)

    def forward(self, x):
        up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
        return torch.relu(x + self.scale * up)


class IRMixed7a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(BasicConv2d(1088, 256, 1),
                                     BasicConv2d(256, 384, 3, 2))
        self.branch1 = nn.Sequential(BasicConv2d(1088, 256, 1),
                                     BasicConv2d(256, 288, 3, 2))
        self.branch2 = nn.Sequential(BasicConv2d(1088, 256, 1),
                                     BasicConv2d(256, 288, 3),
                                     BasicConv2d(288, 320, 3, 2))
        self.branch3 = nn.MaxPool2d(3, 2, 1)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], 1)


class IRBlock8(nn.Module):
    def __init__(self, scale=0.20, no_relu=False):
        super().__init__()
        self.scale, self.no_relu = scale, no_relu
        self.branch0 = BasicConv2d(2080, 192, 1)
        self.branch1 = nn.Sequential(BasicConv2d(2080, 192, 1),
                                     BasicConv2d(192, 224, (1, 3)),
                                     BasicConv2d(224, 256, (3, 1)))
        self.conv2d = nn.Conv2d(448, 2080, 1)

    def forward(self, x):
        up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
        y = x + self.scale * up
        return y if self.no_relu else torch.relu(y)


class TorchInceptionResNetV2(nn.Module):
    """timm ``inception_resnet_v2`` state-dict layout, [C1..C5] taps."""

    def __init__(self):
        super().__init__()
        self.conv2d_1a = BasicConv2d(3, 32, 3, 2)
        self.conv2d_2a = BasicConv2d(32, 32, 3)
        self.conv2d_2b = BasicConv2d(32, 64, 3)
        self.maxpool_3a = nn.MaxPool2d(3, 2, 1)
        self.conv2d_3b = BasicConv2d(64, 80, 1)
        self.conv2d_4a = BasicConv2d(80, 192, 3)
        self.maxpool_5a = nn.MaxPool2d(3, 2, 1)
        self.mixed_5b = IRMixed5b()
        self.repeat = nn.Sequential(*[IRBlock35() for _ in range(10)])
        self.mixed_6a = IRMixed6a()
        self.repeat_1 = nn.Sequential(*[IRBlock17() for _ in range(20)])
        self.mixed_7a = IRMixed7a()
        self.repeat_2 = nn.Sequential(*[IRBlock8() for _ in range(9)])
        self.block8 = IRBlock8(scale=1.0, no_relu=True)
        self.conv2d_7b = BasicConv2d(2080, 1536, 1)

    def forward(self, x):
        y = self.conv2d_2b(self.conv2d_2a(self.conv2d_1a(x)))
        feats = [y]
        y = self.conv2d_4a(self.conv2d_3b(self.maxpool_3a(y)))
        feats.append(y)
        y = self.repeat(self.mixed_5b(self.maxpool_5a(y)))
        feats.append(y)
        y = self.repeat_1(self.mixed_6a(y))
        feats.append(y)
        y = self.conv2d_7b(self.block8(self.repeat_2(self.mixed_7a(y))))
        feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# Classic Xception (Cadene/pretrainedmodels naming == timm legacy_xception)
# ---------------------------------------------------------------------------

class SeparableConv2d(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1, groups=cin, bias=False)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.conv1(x))


class XBlock(nn.Module):
    """Cadene ``Block``: the rep Sequential keeps the parameter-free ReLU /
    MaxPool entries so state-dict indices match real checkpoints."""

    def __init__(self, cin, cout, reps, strides=1, start_with_relu=True,
                 grow_first=True):
        super().__init__()
        if cout != cin or strides != 1:
            self.skip = nn.Conv2d(cin, cout, 1, strides, bias=False)
            self.skipbn = nn.BatchNorm2d(cout)
        rep = []
        filters = cin
        if grow_first:
            rep += [nn.ReLU(), SeparableConv2d(cin, cout),
                    nn.BatchNorm2d(cout)]
            filters = cout
        for _ in range(reps - 1):
            rep += [nn.ReLU(), SeparableConv2d(filters, filters),
                    nn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [nn.ReLU(), SeparableConv2d(cin, cout),
                    nn.BatchNorm2d(cout)]
        if not start_with_relu:
            rep = rep[1:]
        if strides != 1:
            rep.append(nn.MaxPool2d(3, strides, 1))
        self.rep = nn.Sequential(*rep)

    def forward(self, x):
        skip = self.skipbn(self.skip(x)) if hasattr(self, "skip") else x
        return self.rep(x) + skip


class TorchXception(nn.Module):
    """Cadene ``xception`` state-dict layout, [C1..C5] taps."""

    def __init__(self, middle_blocks=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.block1 = XBlock(64, 128, 2, 2, start_with_relu=False)
        self.block2 = XBlock(128, 256, 2, 2)
        self.block3 = XBlock(256, 728, 2, 2)
        for i in range(middle_blocks):
            setattr(self, f"block{4 + i}", XBlock(728, 728, 3))
        self._exit_idx = 4 + middle_blocks
        setattr(self, f"block{self._exit_idx}",
                XBlock(728, 1024, 2, 2, grow_first=False))
        self.conv3 = SeparableConv2d(1024, 1536)
        self.bn3 = nn.BatchNorm2d(1536)
        self.conv4 = SeparableConv2d(1536, 2048)
        self.bn4 = nn.BatchNorm2d(2048)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        feats = [y]
        y = self.block1(y)
        feats.append(y)
        y = self.block2(y)
        feats.append(y)
        y = self.block3(y)
        for i in range(4, self._exit_idx):
            y = getattr(self, f"block{i}")(y)
        feats.append(y)
        y = getattr(self, f"block{self._exit_idx}")(y)
        y = torch.relu(self.bn3(self.conv3(y)))
        y = torch.relu(self.bn4(self.conv4(y)))
        feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# classification_models pre-activation ResNet18/34 (the Keras-era graph) —
# oracle for the .h5 ingestion path (models/keras_h5.py).  Module attribute
# names equal the Keras layer names so the test's h5 exporter is mechanical.
# ---------------------------------------------------------------------------

class TorchPreactResNet(nn.Module):
    """classification_models preact graph: basic (resnet18/34), bottleneck
    (resnet50/101/152) and ChannelSE (seresnet18/34) variants.  SE convs
    are intentionally NOT named stage/unit — the real Keras zoo leaves
    them unnamed (auto ``conv2d_N``), mirrored by the h5 export helper."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), width=64,
                 bottleneck=False, se=False):
        super().__init__()
        self.stage_sizes = tuple(stage_sizes)
        self.bottleneck = bottleneck
        self.se = se
        self.bn_data = nn.BatchNorm2d(3, eps=1e-3)
        self.conv0 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn0 = nn.BatchNorm2d(width, eps=1e-3)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.se_convs = nn.ModuleList()
        cin = width
        for s, n in enumerate(stage_sizes):
            f = width * (2 ** s)
            fout = f * 4 if bottleneck else f
            for u in range(n):
                p = f"stage{s + 1}_unit{u + 1}"
                stride = 2 if (u == 0 and s > 0) else 1
                setattr(self, f"{p}_bn1", nn.BatchNorm2d(cin, eps=1e-3))
                if u == 0:
                    setattr(self, f"{p}_sc",
                            nn.Conv2d(cin, fout, 1, stride, bias=False))
                if bottleneck:
                    setattr(self, f"{p}_conv1",
                            nn.Conv2d(cin, f, 1, 1, bias=False))
                    setattr(self, f"{p}_bn2", nn.BatchNorm2d(f, eps=1e-3))
                    setattr(self, f"{p}_conv2",
                            nn.Conv2d(f, f, 3, stride, 1, bias=False))
                    setattr(self, f"{p}_bn3", nn.BatchNorm2d(f, eps=1e-3))
                    setattr(self, f"{p}_conv3",
                            nn.Conv2d(f, fout, 1, 1, bias=False))
                else:
                    setattr(self, f"{p}_conv1",
                            nn.Conv2d(cin, f, 3, stride, 1, bias=False))
                    setattr(self, f"{p}_bn2", nn.BatchNorm2d(f, eps=1e-3))
                    setattr(self, f"{p}_conv2",
                            nn.Conv2d(f, f, 3, 1, 1, bias=False))
                if se:
                    self.se_convs.append(
                        nn.Conv2d(fout, max(fout // 16, 1), 1))
                    self.se_convs.append(
                        nn.Conv2d(max(fout // 16, 1), fout, 1))
                cin = fout
        self.bn1 = nn.BatchNorm2d(cin, eps=1e-3)

    def forward(self, x):
        feats = []
        y = self.bn_data(x)
        y = torch.relu(self.bn0(self.conv0(y)))
        feats.append(y)                       # C1 = relu0
        y = self.maxpool(y)
        se_i = 0
        for s, n in enumerate(self.stage_sizes):
            for u in range(n):
                p = f"stage{s + 1}_unit{u + 1}"
                h = torch.relu(getattr(self, f"{p}_bn1")(y))
                if u == 0 and s > 0:
                    feats.append(h)           # C2..C4 = stageN_unit1_relu1
                sc = getattr(self, f"{p}_sc")(h) if u == 0 else y
                h = getattr(self, f"{p}_conv1")(h)
                h = torch.relu(getattr(self, f"{p}_bn2")(h))
                h = getattr(self, f"{p}_conv2")(h)
                if self.bottleneck:
                    h = torch.relu(getattr(self, f"{p}_bn3")(h))
                    h = getattr(self, f"{p}_conv3")(h)
                if self.se:
                    a = h.mean(dim=(2, 3), keepdim=True)
                    a = torch.relu(self.se_convs[se_i](a))
                    a = torch.sigmoid(self.se_convs[se_i + 1](a))
                    h = h * a
                    se_i += 2
                y = h + sc
        feats.append(torch.relu(self.bn1(y)))  # C5
        return feats


class TorchMobileNetV1(nn.Module):
    """timm ``mobilenetv1_100`` layout: ``conv_stem``/``bn1`` stem and
    ``blocks.{stage}.{repeat}`` DepthwiseSeparableConv units
    (``conv_dw``/``bn1``/``conv_pw``/``bn2``), ReLU6.  BN eps pinned to
    the Keras 1e-3 to isolate converter correctness (the encoder targets
    the Keras graph; a real timm checkpoint's 1e-5-vs-1e-3 gap only
    perturbs activations by ~var+eps, not the weights)."""

    # timm stage grouping r1/r2/r2/r6/r2 (flattens to keras blocks 1..13)
    _STAGES = ((1, 64), (2, 128), (2, 256), (6, 512), (2, 1024))

    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32, eps=1e-3)
        self.blocks = nn.ModuleList()
        cin = 32
        for si, (reps, ch) in enumerate(self._STAGES):
            stage = nn.ModuleList()
            for j in range(reps):
                blk = nn.Module()
                stride = 2 if (si > 0 and j == 0) else 1
                blk.conv_dw = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin,
                                        bias=False)
                blk.bn1 = nn.BatchNorm2d(cin, eps=1e-3)
                blk.conv_pw = nn.Conv2d(cin, ch, 1, bias=False)
                blk.bn2 = nn.BatchNorm2d(ch, eps=1e-3)
                stage.append(blk)
                cin = ch
            self.blocks.append(stage)

    def forward(self, x):
        relu6 = nn.functional.relu6
        feats = []
        y = relu6(self.bn1(self.conv_stem(x)))
        i = 0
        for stage in self.blocks:
            for blk in stage:
                y = relu6(blk.bn1(blk.conv_dw(y)))
                y = relu6(blk.bn2(blk.conv_pw(y)))
                i += 1
                if i in (1, 3, 5, 11, 13):
                    feats.append(y)
        return feats


class TorchKerasVGG(nn.Module):
    """keras.applications VGG graph (conv+bias, relu, 2x2 maxpool), with
    taps AFTER each pool to mirror VGGEncoder's documented tap deviation."""

    def __init__(self, stage_convs=(2, 2, 3, 3, 3),
                 widths=(64, 128, 256, 512, 512)):
        super().__init__()
        self.stage_convs = tuple(stage_convs)
        cin = 3
        for s, (n, w) in enumerate(zip(stage_convs, widths)):
            for c in range(n):
                setattr(self, f"block{s + 1}_conv{c + 1}",
                        nn.Conv2d(cin, w, 3, 1, 1))
                cin = w

    def forward(self, x):
        feats = []
        y = x
        for s, n in enumerate(self.stage_convs):
            for c in range(n):
                y = torch.relu(getattr(self, f"block{s + 1}_conv{c + 1}")(y))
            y = torch.nn.functional.max_pool2d(y, 2, 2)
            feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# bonlime keras-deeplab-v3-plus: aligned Xception-65 + DeepLab decoder —
# oracle for the pascal_voc .h5 ingestion path.  ModuleDict keys equal the
# bonlime Keras layer names so the test's h5 exporter is mechanical.
#
# Padding note: these oracles replicate TF SAME padding EXPLICITLY for the
# stride-2 3x3 convs (pad (0,1,0,1) at even extents) so the golden tests
# can run at 64x64 — the full model's final x4 upsample needs a
# 4-divisible frame, unlike the tap-only oracles above that use 65.
# ---------------------------------------------------------------------------

def _same_pad_s2(x):
    """TF SAME for kernel 3 / stride 2 at even extents: pad right/bottom."""
    return torch.nn.functional.pad(x, (0, 1, 0, 1))


class TorchSepConvBN(nn.Module):
    """bonlime ``SepConv_BN``: depthwise 3x3 → BN → pointwise 1x1 → BN."""

    def __init__(self, cin, cout, stride=1, rate=1, depth_activation=False,
                 eps=1e-3):
        super().__init__()
        self.stride = stride
        self.depth_activation = depth_activation
        pad = 0 if stride == 2 else rate
        self.depthwise = nn.Conv2d(cin, cin, 3, stride, pad, dilation=rate,
                                   groups=cin, bias=False)
        self.depthwise_BN = nn.BatchNorm2d(cin, eps=eps)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)
        self.pointwise_BN = nn.BatchNorm2d(cout, eps=eps)

    def forward(self, x):
        if not self.depth_activation:
            x = torch.relu(x)
        if self.stride == 2:
            x = _same_pad_s2(x)
        x = self.depthwise_BN(self.depthwise(x))
        if self.depth_activation:
            x = torch.relu(x)
        x = self.pointwise_BN(self.pointwise(x))
        if self.depth_activation:
            x = torch.relu(x)
        return x


class TorchAlignedXception(nn.Module):
    """bonlime modified-aligned Xception-65, [C1..C5] taps."""

    def __init__(self, output_stride=32):
        super().__init__()
        self.os16 = output_stride == 16
        L = self.layers = nn.ModuleDict()
        L["entry_flow_conv1_1"] = nn.Conv2d(3, 32, 3, 2, 0, bias=False)
        L["entry_flow_conv1_1_BN"] = nn.BatchNorm2d(32, eps=1e-3)
        L["entry_flow_conv1_2"] = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
        L["entry_flow_conv1_2_BN"] = nn.BatchNorm2d(64, eps=1e-3)
        self.block_specs = []

        def add_block(prefix, cin, depths, skip, stride, rate=1,
                      depth_act=False):
            for i in range(3):
                L[f"{prefix}_separable_conv{i + 1}"] = TorchSepConvBN(
                    cin if i == 0 else depths[i - 1], depths[i],
                    stride if i == 2 else 1, rate, depth_act)
            if skip == "conv":
                L[f"{prefix}_shortcut"] = nn.Conv2d(cin, depths[-1], 1,
                                                    stride, bias=False)
                L[f"{prefix}_shortcut_BN"] = nn.BatchNorm2d(depths[-1],
                                                            eps=1e-3)
            self.block_specs.append((prefix, skip))

        add_block("entry_flow_block1", 64, [128] * 3, "conv", 2)
        add_block("entry_flow_block2", 128, [256] * 3, "conv", 2)
        add_block("entry_flow_block3", 256, [728] * 3, "conv", 2)
        for i in range(16):
            add_block(f"middle_flow_unit_{i + 1}", 728, [728] * 3, "sum", 1)
        add_block("exit_flow_block1", 728, [728, 1024, 1024], "conv",
                  1 if self.os16 else 2)
        add_block("exit_flow_block2", 1024, [1536, 1536, 2048], "none", 1,
                  rate=2 if self.os16 else 1, depth_act=True)

    def _block(self, y, prefix, skip, return_skip=False):
        L = self.layers
        residual, mid = y, None
        for i in range(3):
            residual = L[f"{prefix}_separable_conv{i + 1}"](residual)
            if i == 1 and return_skip:
                mid = residual
        if skip == "conv":
            stride = L[f"{prefix}_shortcut"].stride[0]
            sc = L[f"{prefix}_shortcut"](y)
            residual = residual + L[f"{prefix}_shortcut_BN"](sc)
        elif skip == "sum":
            residual = residual + y
        return (residual, mid) if return_skip else residual

    def forward(self, x):
        L = self.layers
        y = torch.relu(L["entry_flow_conv1_1_BN"](
            L["entry_flow_conv1_1"](_same_pad_s2(x))))
        y = torch.relu(L["entry_flow_conv1_2_BN"](
            L["entry_flow_conv1_2"](y)))
        feats = [y]
        y = self._block(y, "entry_flow_block1", "conv")
        y, mid = self._block(y, "entry_flow_block2", "conv",
                             return_skip=True)
        feats.append(mid)
        feats.append(y)
        y = self._block(y, "entry_flow_block3", "conv")
        for i in range(16):
            y = self._block(y, f"middle_flow_unit_{i + 1}", "sum")
        feats.append(y)
        y = self._block(y, "exit_flow_block1", "conv")
        y = self._block(y, "exit_flow_block2", "none")
        feats.append(y)
        return feats


class TorchAlignedDeepLab(nn.Module):
    """Full bonlime DeepLabV3+ (aligned-xception backbone, OS16): the
    oracle for the whole-model pascal_voc load (encoder + decoder +
    logits)."""

    def __init__(self, classes=21):
        super().__init__()
        self.backbone = TorchAlignedXception(output_stride=16)
        D = self.dec = nn.ModuleDict()
        D["image_pooling"] = nn.Conv2d(2048, 256, 1, bias=False)
        D["image_pooling_BN"] = nn.BatchNorm2d(256, eps=1e-5)
        D["aspp0"] = nn.Conv2d(2048, 256, 1, bias=False)
        D["aspp0_BN"] = nn.BatchNorm2d(256, eps=1e-5)
        for i, r in enumerate((6, 12, 18)):
            D[f"aspp{i + 1}"] = TorchSepConvBN(2048, 256, rate=r,
                                               depth_activation=True,
                                               eps=1e-5)
        D["concat_projection"] = nn.Conv2d(5 * 256, 256, 1, bias=False)
        D["concat_projection_BN"] = nn.BatchNorm2d(256, eps=1e-5)
        D["feature_projection0"] = nn.Conv2d(256, 48, 1, bias=False)
        D["feature_projection0_BN"] = nn.BatchNorm2d(48, eps=1e-5)
        D["decoder_conv0"] = TorchSepConvBN(256 + 48, 256,
                                            depth_activation=True, eps=1e-5)
        D["decoder_conv1"] = TorchSepConvBN(256, 256,
                                            depth_activation=True, eps=1e-5)
        self.logits_semantic = nn.Conv2d(256, classes, 1)

    def forward(self, x):
        D = self.dec
        up = lambda t, hw: torch.nn.functional.interpolate(  # noqa: E731
            t, size=hw, mode="bilinear", align_corners=False)
        feats = self.backbone(x)
        c5, skip = feats[4], feats[1]
        hw = c5.shape[2:]
        b4 = c5.mean((2, 3), keepdim=True)
        b4 = up(torch.relu(D["image_pooling_BN"](D["image_pooling"](b4))),
                hw)
        b0 = torch.relu(D["aspp0_BN"](D["aspp0"](c5)))
        y = torch.cat([b4, b0, D["aspp1"](c5), D["aspp2"](c5),
                       D["aspp3"](c5)], 1)
        y = torch.relu(D["concat_projection_BN"](D["concat_projection"](y)))
        y = up(y, skip.shape[2:])
        low = torch.relu(D["feature_projection0_BN"](
            D["feature_projection0"](skip)))
        y = D["decoder_conv1"](D["decoder_conv0"](torch.cat([y, low], 1)))
        y = self.logits_semantic(y)
        return up(y, (skip.shape[2] * 4, skip.shape[3] * 4))


# ---------------------------------------------------------------------------
# Cadene senet154 (pretrainedmodels senet.py::SENet + SEBottleneck) — the
# remaining member of the reference zoo's "senet" family.  State-dict
# naming: layer0.conv{1..3}/bn{1..3} deep stem, layer{1..4}.{i} blocks with
# se_module.fc{1,2} and kernel-3 downsamples on strided stages.
# ---------------------------------------------------------------------------

class SEBottleneck154(nn.Module):
    def __init__(self, inplanes, planes, stride=1, down_kernel=0,
                 groups=64):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes * 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes * 2)
        self.conv2 = nn.Conv2d(planes * 2, planes * 4, 3, stride, 1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(planes * 4)
        self.conv3 = nn.Conv2d(planes * 4, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.se_module = SEModule(planes * 4)
        self.downsample = None
        if down_kernel:
            pad = (down_kernel - 1) // 2
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, down_kernel, stride, pad,
                          bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(self.se_module(y) + identity)


class _SENetLayer0(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.conv3 = nn.Conv2d(64, 128, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(128)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        return torch.relu(self.bn3(self.conv3(y)))


class TorchSENet154(nn.Module):
    """[C1..C5] taps; stage_sizes shrinkable for test cost."""

    def __init__(self, stage_sizes=(3, 8, 36, 3)):
        super().__init__()
        self.layer0 = _SENetLayer0()
        inplanes = 128
        for s, n in enumerate(stage_sizes):
            planes = 64 * (2 ** s)
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                down = 0
                if b == 0:
                    down = 1 if s == 0 else 3
                blocks.append(SEBottleneck154(inplanes, planes, stride,
                                              down_kernel=down))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
        self.stage_count = len(stage_sizes)

    def forward(self, x):
        y = self.layer0(x)
        feats = [y]
        y = torch.nn.functional.max_pool2d(y, 3, 2, 1)
        for s in range(self.stage_count):
            y = getattr(self, f"layer{s + 1}")(y)
            feats.append(y)
        return feats
