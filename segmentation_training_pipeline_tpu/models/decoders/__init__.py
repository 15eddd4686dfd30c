from .unet import UnetDecoder
from .fpn import FPNDecoder
from .linknet import LinknetDecoder
from .pspnet import PSPDecoder
from .deeplab import AlignedDeepLabDecoder, DeepLabV3PlusDecoder
