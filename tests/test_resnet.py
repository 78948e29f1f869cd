"""ResNet-50 backbone parity vs torchvision (trunk) + torch deconv head.

The reference's ResNet_50 (`romp/lib/models/resnet_50.py:19`) is the
torchvision resnet50 trunk + 3 ConvTranspose upsample layers; we rebuild the
oracle from torchvision + nn.ConvTranspose2d so the training repo's
config-singleton import machinery isn't needed.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.layers import ParamStore
from romp_tpu.models.resnet import resnet50
from romp_tpu.utils.checkpoint import convert_torch_state_dict

torch = pytest.importorskip("torch")


class _TorchBottleneck(torch.nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class _TorchTrunk(torch.nn.Module):
    """Textbook ResNet-50 trunk with torchvision-compatible names."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for si, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], 1):
            layers = []
            for b in range(blocks):
                ds = None
                s = stride if b == 0 else 1
                if b == 0:
                    ds = torch.nn.Sequential(
                        torch.nn.Conv2d(inplanes, planes * 4, 1, s,
                                        bias=False),
                        torch.nn.BatchNorm2d(planes * 4))
                layers.append(_TorchBottleneck(inplanes, planes, s, ds))
                inplanes = planes * 4
            setattr(self, f"layer{si}", torch.nn.Sequential(*layers))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(y))))


@pytest.mark.slow
def test_resnet50_backbone_parity():
    torch.manual_seed(0)
    trunk = _TorchTrunk().eval()
    deconv = torch.nn.Sequential()
    inplanes = 2048
    for planes in (256, 128, 64):
        deconv.append(torch.nn.ConvTranspose2d(
            inplanes, planes, 4, stride=2, padding=1, output_padding=0,
            bias=False))
        deconv.append(torch.nn.BatchNorm2d(planes, momentum=0.1))
        deconv.append(torch.nn.ReLU(inplace=True))
        inplanes = planes
    deconv = deconv.eval()

    sd = {}
    for k, v in trunk.state_dict().items():
        if k.startswith("fc."):
            continue
        sd[f"backbone.{k}"] = v
    for k, v in deconv.state_dict().items():
        sd[f"backbone.deconv_layers.{k}"] = v
    params = {k: jnp.asarray(v)
              for k, v in convert_torch_state_dict(sd).items()}

    rng = np.random.RandomState(0)
    image = rng.rand(1, 256, 256, 3).astype(np.float32) * 255.0

    # reference forward (ImageNet-normalized input, trunk then deconv)
    x = torch.from_numpy(image.transpose(0, 3, 1, 2)) / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (x - mean) / std
    with torch.no_grad():
        y = trunk.maxpool(trunk.relu(trunk.bn1(trunk.conv1(x))))
        y = trunk.layer4(trunk.layer3(trunk.layer2(trunk.layer1(y))))
        y = deconv(y)
    ref = y.numpy().transpose(0, 2, 3, 1)

    ours = jax.jit(lambda p, im: resnet50(ParamStore(p), im))(
        params, jnp.asarray(image))
    assert ours.shape == ref.shape == (1, 64, 64, 64)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)
