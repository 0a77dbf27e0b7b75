"""Dataset pipelines (host-side tokenization; mel runs on device)."""

from mr_mt3_tpu.data.slakh import (
    SlakhDataset,
    SlakhDatasetWithPrevSegmem,
    SlakhDatasetWithPrevSegmemAugment,
)
from mr_mt3_tpu.data.commu import ComMUDataset
from mr_mt3_tpu.data.loader import DataLoader, collate_batch
