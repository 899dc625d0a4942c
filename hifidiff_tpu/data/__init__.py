from hifidiff_tpu.data.core import (ArrayDataset, ConcatDataset,
                                    Dataset, Loader)
from hifidiff_tpu.data.kface import (
    KFaceCropDataset,
    KFaceCropHRDataset,
    KFaceCropIDCDataset,
    KFaceDataset,
    KFaceHRDataset,
    KFaceIDCDataset,
)
from hifidiff_tpu.data.multipie import (
    MultiPIEDataset,
    MultiPIEIDCDataset,
    MultiPIEInferenceDataset,
    MultiPIESingleViewDataset,
)
from hifidiff_tpu.data.pretraining import CelebAHQDataset, MultiPIEHQDataset

__all__ = [
    "ArrayDataset", "Dataset", "ConcatDataset", "Loader",
    "KFaceDataset", "KFaceCropDataset", "KFaceIDCDataset",
    "KFaceCropIDCDataset", "KFaceHRDataset", "KFaceCropHRDataset",
    "MultiPIEDataset", "MultiPIESingleViewDataset",
    "MultiPIEInferenceDataset", "MultiPIEIDCDataset",
    "MultiPIEHQDataset", "CelebAHQDataset",
]
