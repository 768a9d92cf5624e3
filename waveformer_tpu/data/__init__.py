from waveformer_tpu.data.dataset import (  # noqa: F401
    MedicalDataset,
    get_kfold_loader,
    get_train_val_test_loader_from_train,
)
from waveformer_tpu.data.patch_sampler import PatchSampler  # noqa: F401
from waveformer_tpu.data.pipeline import PrefetchLoader  # noqa: F401
from waveformer_tpu.data.preprocessing import (  # noqa: F401
    CTPreprocessor,
    DefaultPreprocessor,
    MultiInputRegionPreprocessor,
    MultiModalityPreprocessor,
    OrganMaskPreprocessor,
)
