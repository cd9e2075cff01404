"""Compact PyTorch HRNet used ONLY as a numerical oracle in tests.

Written fresh against the architecture description (SURVEY.md §2.4,
reference: models/HRnet.py) with the standard torch state_dict naming so it
exercises stlpose_tpu.models.convert's name mapping. Never imported by
production code.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from stlpose_tpu.config import HRNetConfig


def _cbr(cin, cout, k, s, relu=True):
    layers = [nn.Conv2d(cin, cout, k, s, k // 2, bias=False),
              nn.BatchNorm2d(cout)]
    if relu:
        layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


class TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class TModule(nn.Module):
    def __init__(self, stage, in_chs, multi_scale_output=True):
        super().__init__()
        self.nb = stage.num_branches
        self.mso = multi_scale_output
        chs = list(stage.num_channels)
        self.branches = nn.ModuleList()
        for b in range(self.nb):
            blocks = []
            cin = in_chs[b]
            for _ in range(stage.num_blocks[b]):
                down = (_cbr(cin, chs[b], 1, 1, relu=False)
                        if cin != chs[b] else None)
                blocks.append(TBasic(cin, chs[b], 1, down))
                cin = chs[b]
            self.branches.append(nn.Sequential(*blocks))
        n_out = self.nb if multi_scale_output else 1
        fl = []
        for i in range(n_out):
            row = []
            for j in range(self.nb):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(chs[j], chs[i], 1, 1, 0, bias=False),
                        nn.BatchNorm2d(chs[i]),
                        nn.Upsample(scale_factor=2 ** (j - i), mode="nearest")))
                elif j == i:
                    row.append(None)
                else:
                    seq = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        seq.append(_cbr(chs[j] if k == 0 else chs[j],
                                        chs[i] if last else chs[j], 3, 2,
                                        relu=not last))
                    row.append(nn.Sequential(*seq))
            fl.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fl)

    def forward(self, xs):
        ys = [br(x) for br, x in zip(self.branches, xs)]
        out = []
        for i in range(len(self.fuse_layers)):
            acc = ys[0] if i == 0 else self.fuse_layers[i][0](ys[0])
            for j in range(1, self.nb):
                acc = acc + (ys[j] if i == j else self.fuse_layers[i][j](ys[j]))
            out.append(F.relu(acc))
        return out


class TorchHRNet(nn.Module):
    def __init__(self, cfg: HRNetConfig):
        super().__init__()
        self.cfg = cfg
        sc = cfg.stem_channels
        self.conv1 = nn.Conv2d(3, sc, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(sc)
        self.conv2 = nn.Conv2d(sc, sc, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(sc)
        blocks = []
        cin = sc
        for k in range(cfg.stage1_num_blocks):
            down = (_cbr(cin, sc * 4, 1, 1, relu=False) if k == 0 else None)
            blocks.append(TBottleneck(cin, sc, 1, down))
            cin = sc * 4
        self.layer1 = nn.Sequential(*blocks)

        prev = [sc * 4]
        for t, stage in enumerate((cfg.stage2, cfg.stage3, cfg.stage4), 1):
            trans = nn.ModuleList()
            for i in range(stage.num_branches):
                if i < len(prev):
                    trans.append(_cbr(prev[i], stage.num_channels[i], 3, 1)
                                 if prev[i] != stage.num_channels[i]
                                 else nn.Identity())
                else:
                    seq = []
                    for j in range(i + 1 - len(prev)):
                        out_ch = (stage.num_channels[i]
                                  if j == i - len(prev) else prev[-1])
                        seq.append(_cbr(prev[-1], out_ch, 3, 2))
                    trans.append(nn.Sequential(*seq))
            setattr(self, f"transition{t}", trans)
            mods = []
            for m in range(stage.num_modules):
                mso = not (t == 3 and m == stage.num_modules - 1)
                mods.append(TModule(stage, list(stage.num_channels), mso))
            setattr(self, f"stage{t + 1}", nn.Sequential(*mods))
            prev = list(stage.num_channels)

        k = cfg.final_conv_kernel
        self.final_layer = nn.Conv2d(cfg.stage4.num_channels[0],
                                     cfg.num_joints, k, 1,
                                     1 if k == 3 else 0)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        for t, stage in enumerate((self.cfg.stage2, self.cfg.stage3,
                                   self.cfg.stage4), 1):
            trans = getattr(self, f"transition{t}")
            nxt = []
            for i in range(stage.num_branches):
                if i < len(xs):
                    nxt.append(trans[i](xs[i]))
                else:
                    nxt.append(trans[i](xs[-1]))
            xs = nxt
            for mod in getattr(self, f"stage{t + 1}"):
                xs = mod(xs)
        return self.final_layer(xs[0])
