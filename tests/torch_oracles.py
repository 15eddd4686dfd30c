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
