"""Model zoo.

Like the reference (models/__init__.py:11-12 eagerly imports only my_vit +
vision_transformer; other families need explicit import), the ViT family is
registered eagerly and additional families register on import.
"""
from vision_transformers_torch_xla_tpu.models.registry import (  # noqa: F401
    get_default_cfg,
    is_model,
    list_models,
    model_entrypoint,
    register_model,
    split_model_name_tag,
)
from vision_transformers_torch_xla_tpu.models.factory import create_model  # noqa: F401
from vision_transformers_torch_xla_tpu.models.pretrained import (  # noqa: F401
    apply_pretrained,
    push_to_hf_hub,
    save_local_dir,
)
from vision_transformers_torch_xla_tpu.models.vit import (  # noqa: F401
    NO_WEIGHT_DECAY_KEYWORDS,
    VisionTransformer,
)

# eager registrations (parity: reference models/__init__.py:11-12 registers
# only the ViT family; ConvNeXt is the other family its CLI accepts)
import vision_transformers_torch_xla_tpu.models.vision_transformer_zoo  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.naflexvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.my_vit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.convnext  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.deit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mlp_mixer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.resnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.swin  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.swin_v2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.eva  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.nfnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.metaformer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mobilenetv3  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.levit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.tiny_vit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.hiera  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mvitv2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.davit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.twins  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.gcvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.nest  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.coat  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.volo  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.efficientformer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.focalnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.convit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.pit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.crossvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.tnt  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mobilevit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vgg  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.densenet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.inception  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.xception  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.edgenext  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.ghostnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.visformer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.swiftformer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.fastvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.repvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.efficientvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.resnest  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.starnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.shvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.rexnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vovnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.inception_next  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.fasternet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mambaout  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.nextvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.efficientformer_v2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.cspnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.resnetv2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.sequencer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.dpn  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.tresnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.dla  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.sknet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.hgnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.selecsls  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vit_relpos  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.inception_v4  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.inception_resnet_v2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.repghost  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vit_sam  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.hardcorenas  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.senet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.xception_aligned  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.rdnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.efficientnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vit_hybrid  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.cait  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.pvt_v2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.beit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.regnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.xcit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.maxvit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.convmixer  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.mobilenetv5  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.byobnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.vitamin  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.efficientvit_mit  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.hieradet_sam2  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.hrnet  # noqa: F401,E402
import vision_transformers_torch_xla_tpu.models.nasnet  # noqa: F401,E402

# pretrained-tag cfgs + deprecation aliases (reference generate_default_cfgs
# and register_model_deprecations data, extracted to JSON by
# tools/gen_pretrained_cfgs.py)
import os as _os  # noqa: E402

from vision_transformers_torch_xla_tpu.models.registry import (  # noqa: E402
    load_pretrained_cfg_db as _load_db,
)

_load_db(_os.path.join(_os.path.dirname(__file__), "pretrained_cfgs.json"))
