from gomavatar_tpu.data.dataset import (
    TrainDataset,
    ZJUTestDataset,
    FreeviewDataset,
    NewPoseDataset,
    to_device,
    Prefetcher,
)
