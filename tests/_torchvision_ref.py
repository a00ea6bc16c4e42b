"""Minimal torch re-implementations of the torchvision trunks the reference
wraps (cubercnn/modeling/backbone/{resnet,densenet,mnasnet,shufflenet}.py),
with state-dict naming IDENTICAL to torchvision's — torchvision itself is
not in this image, so these stand-ins provide (a) official-naming state
dicts to exercise the converters and (b) torch forward passes for numeric
parity. Forward tap points mirror the reference backbone forwards.
"""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------- ResNet --------------------------------------
class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TVResNet(nn.Module):
    """Feature-tap forward mirrors reference resnet.py:43-62."""

    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        p2 = self.layer1(x)
        p3 = self.layer2(p2)
        p4 = self.layer3(p3)
        p5 = self.layer4(p4)
        p6 = F.max_pool2d(p5, kernel_size=1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


def tv_resnet(name: str) -> TVResNet:
    specs = {
        "resnet18": (_BasicBlock, (2, 2, 2, 2)),
        "resnet34": (_BasicBlock, (3, 4, 6, 3)),
        "resnet50": (_Bottleneck, (3, 4, 6, 3)),
        "resnet101": (_Bottleneck, (3, 4, 23, 3)),
    }
    return TVResNet(*specs[name])


# ---------------------------- DenseNet ------------------------------------
class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, 1, 1, bias=False)

    def forward(self, x):
        out = self.conv1(self.relu1(self.norm1(x)))
        out = self.conv2(self.relu2(self.norm2(out)))
        return torch.cat([x, out], 1)


class TVDenseNet(nn.Module):
    """densenet121 `features`; taps mirror reference densenet.py:23-37."""

    def __init__(self, block_counts=(6, 12, 24, 16), growth=32, init_features=64):
        super().__init__()
        feats = OrderedDict(
            conv0=nn.Conv2d(3, init_features, 7, 2, 3, bias=False),
            norm0=nn.BatchNorm2d(init_features),
            relu0=nn.ReLU(inplace=True),
            pool0=nn.MaxPool2d(3, 2, 1),
        )
        ch = init_features
        for b, n in enumerate(block_counts):
            block = nn.Module()
            for li in range(n):
                block.add_module(f"denselayer{li + 1}", _DenseLayer(ch + li * growth, growth))
            feats[f"denseblock{b + 1}"] = _Seq(block, n)
            ch += n * growth
            if b != len(block_counts) - 1:
                trans = nn.Module()
                trans.add_module("norm", nn.BatchNorm2d(ch))
                trans.add_module("relu", nn.ReLU(inplace=True))
                trans.add_module("conv", nn.Conv2d(ch, ch // 2, 1, bias=False))
                trans.add_module("pool", nn.AvgPool2d(2, 2))
                feats[f"transition{b + 1}"] = _TransSeq(trans)
                ch = ch // 2
        feats["norm5"] = nn.BatchNorm2d(ch)
        self.features = nn.Sequential(feats)

    def forward(self, x):
        p2 = self.features[0:5](x)
        p3 = self.features[5:7](p2)
        p4 = self.features[7:9](p3)
        p5 = self.features[9:](p4)
        p6 = F.max_pool2d(p5, kernel_size=1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


class _Seq(nn.Module):
    """Runs a dense block's denselayers in order (keeps torchvision names)."""

    def __init__(self, holder, n):
        super().__init__()
        self._n = n
        for name, mod in holder.named_children():
            self.add_module(name, mod)

    def forward(self, x):
        for i in range(self._n):
            x = getattr(self, f"denselayer{i + 1}")(x)
        return x


class _TransSeq(nn.Module):
    def __init__(self, holder):
        super().__init__()
        for name, mod in holder.named_children():
            self.add_module(name, mod)

    def forward(self, x):
        return self.pool(self.conv(self.relu(self.norm(x))))


# ---------------------------- MNASNet -------------------------------------
class _InvertedResidual(nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride, expansion):
        super().__init__()
        mid = in_ch * expansion
        self.apply_residual = in_ch == out_ch and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(in_ch, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, kernel, stride, kernel // 2, groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
        )

    def forward(self, x):
        out = self.layers(x)
        return out + x if self.apply_residual else out


def _stack(in_ch, out_ch, kernel, stride, expansion, repeats):
    mods = [_InvertedResidual(in_ch, out_ch, kernel, stride, expansion)]
    for _ in range(1, repeats):
        mods.append(_InvertedResidual(out_ch, out_ch, kernel, 1, expansion))
    return nn.Sequential(*mods)


class TVMNASNet(nn.Module):
    """mnasnet1_0 `layers`; taps mirror reference mnasnet.py:23-37."""

    def __init__(self):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False),
            nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, 1, 1, groups=32, bias=False),
            nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 1, bias=False),
            nn.BatchNorm2d(16),
            _stack(16, 24, 3, 2, 3, 3),
            _stack(24, 40, 5, 2, 3, 3),
            _stack(40, 80, 5, 2, 6, 3),
            _stack(80, 96, 3, 1, 6, 2),
            _stack(96, 192, 5, 2, 6, 4),
            _stack(192, 320, 3, 1, 6, 1),
        )

    def forward(self, x):
        p2 = self.layers[0:9](x)
        p3 = self.layers[9](p2)
        p4 = self.layers[10:12](p3)
        p5 = self.layers[12:14](p4)
        p6 = F.max_pool2d(p5, kernel_size=1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


# ---------------------------- ShuffleNetV2 --------------------------------
def _channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    return (
        x.view(b, groups, c // groups, h, w).transpose(1, 2).reshape(b, c, h, w)
    )


class _ShuffleUnit(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        half = out_ch // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(in_ch, in_ch, 3, stride, 1, groups=in_ch, bias=False),
                nn.BatchNorm2d(in_ch),
                nn.Conv2d(in_ch, half, 1, bias=False),
                nn.BatchNorm2d(half),
                nn.ReLU(inplace=True),
            )
            b2_in = in_ch
        else:
            self.branch1 = nn.Sequential()
            b2_in = in_ch // 2
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, half, 1, bias=False),
            nn.BatchNorm2d(half),
            nn.ReLU(inplace=True),
            nn.Conv2d(half, half, 3, stride, 1, groups=half, bias=False),
            nn.BatchNorm2d(half),
            nn.Conv2d(half, half, 1, bias=False),
            nn.BatchNorm2d(half),
            nn.ReLU(inplace=True),
        )
        self.stride = stride

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _channel_shuffle(out)


class TVShuffleNetV2(nn.Module):
    """shufflenet_v2_x1_0; taps mirror reference shufflenet.py:27-42
    (conv5 present in the checkpoint but unused by the forward)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 24, 3, 2, 1, bias=False),
            nn.BatchNorm2d(24),
            nn.ReLU(inplace=True),
        )
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [(24, 116, 4), (116, 232, 8), (232, 464, 4)]
        for si, (ic, oc, n) in enumerate(chans):
            mods = [_ShuffleUnit(ic, oc, 2)]
            for _ in range(1, n):
                mods.append(_ShuffleUnit(oc, oc, 1))
            setattr(self, f"stage{si + 2}", nn.Sequential(*mods))
        self.conv5 = nn.Sequential(
            nn.Conv2d(464, 1024, 1, bias=False),
            nn.BatchNorm2d(1024),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        p2 = self.maxpool(self.conv1(x))
        p3 = self.stage2(p2)
        p4 = self.stage3(p3)
        p5 = self.stage4(p4)
        p6 = F.max_pool2d(p5, kernel_size=1, stride=2)
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}


def randomize_bn_stats(model: nn.Module, seed: int = 0):
    """Give every BN non-trivial running stats so a stats-mapping bug can't
    hide behind the (mean=0, var=1) initialisation."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.2
            m.running_var = torch.rand(m.num_features, generator=g) * 1.5 + 0.3
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
    return model
