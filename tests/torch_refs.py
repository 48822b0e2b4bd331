"""Torch ground-truth models for parity testing (test fixture only).

These are compact torch reconstructions of the reference family's
architectures (SURVEY.md §2.1 behavioral spec: pix2pix / pix2pixHD
generators and discriminators) used solely to produce golden outputs and
state_dicts for the importer/parity tests (SURVEY.md §4.2). The production
framework never imports this module.
"""

import functools

import torch
import torch.nn as nn

torch.backends.mkldnn.enabled = False


def norm_layer_factory(norm):
    if norm == "instance":
        return functools.partial(nn.InstanceNorm2d, affine=False,
                                 track_running_stats=False)
    if norm == "batch":
        return nn.BatchNorm2d
    raise ValueError(norm)


class ResnetBlock(nn.Module):
    def __init__(self, dim, norm_layer, use_dropout=False):
        super().__init__()
        layers = [nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                  norm_layer(dim), nn.ReLU(True)]
        if use_dropout:
            layers += [nn.Dropout(0.5)]
        layers += [nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                   norm_layer(dim)]
        self.conv_block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv_block(x)


class ResnetGenerator(nn.Module):
    """c7s1-ngf, n downs, n_blocks res blocks, n ups, c7s1-out + tanh."""

    def __init__(self, input_nc=3, output_nc=3, ngf=64, n_blocks=9,
                 n_downsampling=2, norm="instance", with_tail=True):
        super().__init__()
        norm_layer = norm_layer_factory(norm)
        use_bias = norm == "instance"
        model = [nn.ReflectionPad2d(3),
                 nn.Conv2d(input_nc, ngf, 7, bias=use_bias),
                 norm_layer(ngf), nn.ReLU(True)]
        mult = 1
        for _ in range(n_downsampling):
            model += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=2,
                                padding=1, bias=use_bias),
                      norm_layer(ngf * mult * 2), nn.ReLU(True)]
            mult *= 2
        for _ in range(n_blocks):
            model += [ResnetBlock(ngf * mult, norm_layer)]
        for _ in range(n_downsampling):
            model += [nn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3,
                                         stride=2, padding=1,
                                         output_padding=1, bias=use_bias),
                      norm_layer(ngf * mult // 2), nn.ReLU(True)]
            mult //= 2
        if with_tail:
            model += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7),
                      nn.Tanh()]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class LocalEnhancer(nn.Module):
    """pix2pixHD coarse-to-fine: headless global trunk at 1/2 res + local
    branch joined by elementwise sum (family naming: model / model1_1 /
    model1_2)."""

    def __init__(self, input_nc=3, output_nc=3, ngf=32,
                 n_downsample_global=4, n_blocks_global=9, n_blocks_local=3,
                 n_local_enhancers=1, norm="instance"):
        super().__init__()
        self.n_local_enhancers = n_local_enhancers
        norm_layer = norm_layer_factory(norm)
        use_bias = norm == "instance"
        ngf_global = ngf * (2 ** n_local_enhancers)
        self.model = ResnetGenerator(
            input_nc, output_nc, ngf_global, n_blocks_global,
            n_downsample_global, norm, with_tail=False).model
        for n in range(1, n_local_enhancers + 1):
            ngf_n = ngf * (2 ** (n_local_enhancers - n))
            down = [nn.ReflectionPad2d(3),
                    nn.Conv2d(input_nc, ngf_n, 7, bias=use_bias),
                    norm_layer(ngf_n), nn.ReLU(True),
                    nn.Conv2d(ngf_n, ngf_n * 2, 3, stride=2, padding=1,
                              bias=use_bias),
                    norm_layer(ngf_n * 2), nn.ReLU(True)]
            up = []
            for _ in range(n_blocks_local):
                up += [ResnetBlock(ngf_n * 2, norm_layer)]
            up += [nn.ConvTranspose2d(ngf_n * 2, ngf_n, 3, stride=2,
                                      padding=1, output_padding=1,
                                      bias=use_bias),
                   norm_layer(ngf_n), nn.ReLU(True)]
            if n == n_local_enhancers:
                up += [nn.ReflectionPad2d(3), nn.Conv2d(ngf_n, output_nc, 7),
                       nn.Tanh()]
            setattr(self, f"model{n}_1", nn.Sequential(*down))
            setattr(self, f"model{n}_2", nn.Sequential(*up))
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)

    def forward(self, x):
        pyramid = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(self.downsample(pyramid[-1]))
        out = self.model(pyramid[-1])
        for n in range(1, self.n_local_enhancers + 1):
            down = getattr(self, f"model{n}_1")
            up = getattr(self, f"model{n}_2")
            out = up(down(pyramid[self.n_local_enhancers - n]) + out)
        return out


class UnetSkipConnectionBlock(nn.Module):
    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False, norm="instance",
                 use_dropout=False):
        super().__init__()
        self.outermost = outermost
        norm_layer = norm_layer_factory(norm)
        use_bias = norm == "instance"
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, stride=2, padding=1,
                             bias=use_bias)
        downrelu = nn.LeakyReLU(0.2, True)
        downnorm = norm_layer(inner_nc)
        uprelu = nn.ReLU(True)
        upnorm = norm_layer(outer_nc)
        if outermost:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2,
                                        padding=1)
            model = [downconv] + [submodule] + [uprelu, upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, stride=2,
                                        padding=1, bias=use_bias)
            model = [downrelu, downconv] + [uprelu, upconv, upnorm]
        else:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2,
                                        padding=1, bias=use_bias)
            model = ([downrelu, downconv, downnorm] + [submodule]
                     + [uprelu, upconv, upnorm])
            if use_dropout:
                model += [nn.Dropout(0.5)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class UnetGenerator(nn.Module):
    def __init__(self, input_nc=3, output_nc=3, num_downs=8, ngf=64,
                 norm="instance"):
        super().__init__()
        block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, innermost=True,
                                        norm=norm)
        for _ in range(num_downs - 5):
            block = UnetSkipConnectionBlock(ngf * 8, ngf * 8,
                                            submodule=block, norm=norm)
        block = UnetSkipConnectionBlock(ngf * 4, ngf * 8, submodule=block,
                                        norm=norm)
        block = UnetSkipConnectionBlock(ngf * 2, ngf * 4, submodule=block,
                                        norm=norm)
        block = UnetSkipConnectionBlock(ngf, ngf * 2, submodule=block,
                                        norm=norm)
        self.model = UnetSkipConnectionBlock(output_nc, ngf,
                                             input_nc=input_nc,
                                             submodule=block, outermost=True,
                                             norm=norm)

    def forward(self, x):
        return self.model(x)


class NLayerDiscriminator(nn.Module):
    def __init__(self, input_nc=6, ndf=64, n_layers=3, norm="instance",
                 get_interm_feat=True, padw=2):
        super().__init__()
        self.get_interm_feat = get_interm_feat
        self.n_layers = n_layers
        norm_layer = norm_layer_factory(norm)
        use_bias = norm == "instance"
        sequence = [[nn.Conv2d(input_nc, ndf, 4, stride=2, padding=padw),
                     nn.LeakyReLU(0.2, True)]]
        nf = ndf
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            sequence += [[nn.Conv2d(nf_prev, nf, 4, stride=2, padding=padw,
                                    bias=use_bias),
                          norm_layer(nf), nn.LeakyReLU(0.2, True)]]
        nf_prev, nf = nf, min(nf * 2, 512)
        sequence += [[nn.Conv2d(nf_prev, nf, 4, stride=1, padding=padw,
                                bias=use_bias),
                      norm_layer(nf), nn.LeakyReLU(0.2, True)]]
        sequence += [[nn.Conv2d(nf, 1, 4, stride=1, padding=padw)]]
        if get_interm_feat:
            for n, seq in enumerate(sequence):
                setattr(self, f"model{n}", nn.Sequential(*seq))
        else:
            flat = [l for seq in sequence for l in seq]
            self.model = nn.Sequential(*flat)

    def forward(self, x):
        if not self.get_interm_feat:
            return [self.model(x)]
        res = [x]
        for n in range(self.n_layers + 2):
            model = getattr(self, f"model{n}")
            res.append(model(res[-1]))
        return res[1:]


class MultiscaleDiscriminator(nn.Module):
    def __init__(self, input_nc=6, ndf=64, n_layers=3, num_d=2,
                 norm="instance", get_interm_feat=True):
        super().__init__()
        self.num_d = num_d
        self.get_interm_feat = get_interm_feat
        self.n_layers = n_layers
        for i in range(num_d):
            netd = NLayerDiscriminator(input_nc, ndf, n_layers, norm,
                                       get_interm_feat)
            if get_interm_feat:
                for j in range(n_layers + 2):
                    setattr(self, f"scale{i}_layer{j}",
                            getattr(netd, f"model{j}"))
            else:
                setattr(self, f"layer{i}", netd.model)
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)

    def single_forward(self, i, x):
        if self.get_interm_feat:
            res = [x]
            for j in range(self.n_layers + 2):
                res.append(getattr(self, f"scale{i}_layer{j}")(res[-1]))
            return res[1:]
        return [getattr(self, f"layer{i}")(x)]

    def forward(self, x):
        result = []
        xi = x
        for i in range(self.num_d):
            result.append(self.single_forward(self.num_d - 1 - i, xi))
            if i != self.num_d - 1:
                xi = self.downsample(xi)
        return result


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (pytorch-CycleGAN-and-pix2pix --netD pixel)."""

    def __init__(self, input_nc=6, ndf=64, norm="instance"):
        super().__init__()
        norm_layer = norm_layer_factory(norm)
        use_bias = norm == "instance"
        self.net = nn.Sequential(
            nn.Conv2d(input_nc, ndf, 1, stride=1, padding=0),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf, ndf * 2, 1, stride=1, padding=0, bias=use_bias),
            norm_layer(ndf * 2),
            nn.LeakyReLU(0.2, True),
            # the public module passes bias=use_bias here too (no bias
            # under batch norm, even though no norm follows the head)
            nn.Conv2d(ndf * 2, 1, 1, stride=1, padding=0, bias=use_bias))

    def forward(self, x):
        return self.net(x)
