"""ResNet50/VGG16 backbone tests, including exact parity with torchvision via
the weight converter (random-init torchvision model, no downloads)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from deep_spectral_tpu.models.resnet import (
    ResNet50, VGG16Features, convert_torchvision_resnet50,
    resnet50_feature_extractor,
)


def test_vgg16_feature_shapes():
    model = VGG16Features()
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats["stage1"].shape == (1, 64, 96, 64)
    assert feats["stage5"].shape == (1, 4, 6, 512)  # stride 16 before last pool


class _TorchBottleneck(torch.nn.Module):
    """Torch oracle with torchvision's exact structure + state-dict naming."""

    def __init__(self, cin, width, stride=1, dilation=1, downsample=False):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(width * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        return torch.relu(self.bn3(self.conv3(y)) + r)


class _TorchResNet50(torch.nn.Module):
    def __init__(self, rswd=(False, False, False)):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin, dilation = 64, 1
        for li, (n, w) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            if li > 0 and rswd[li - 1]:
                dilation *= stride
                stride = 1
            blocks = []
            for bi in range(n):
                blocks.append(_TorchBottleneck(
                    cin if bi == 0 else w * 4, w,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation, downsample=(bi == 0)))
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
            cin = w * 4

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        y1 = self.layer1(y)
        y4 = self.layer4(self.layer3(self.layer2(y1)))
        return y1, y4


@pytest.mark.parametrize("dilate", [False, True])
def test_resnet50_matches_torch_oracle(dilate):
    rswd = (False, False, dilate)
    torch.manual_seed(0)
    tmodel = _TorchResNet50(rswd).eval()
    # Randomize BN running stats so the test exercises them.
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    variables = convert_torchvision_resnet50(tmodel.state_dict())
    jmodel = ResNet50(replace_stride_with_dilation=rswd)

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t1, t4 = tmodel(torch.from_numpy(x))
    feats = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
    np.testing.assert_allclose(np.asarray(feats["layer1"]),
                               t1.permute(0, 2, 3, 1).numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(feats["layer4"]),
                               t4.permute(0, 2, 3, 1).numpy(), atol=2e-2)
    stride = 16 if dilate else 32
    assert feats["layer4"].shape[1] == 64 // stride


def test_truncated_extractor():
    model, apply_fn = resnet50_feature_extractor("layer3")
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = apply_fn(params, x)
    assert out.shape == (1, 4, 4, 1024)  # layer3: stride 16, 1024 channels
