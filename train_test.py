"""Public trainer API surface — same entry names as the reference
train_test.py (trainTeachersModel :17, trainStudentsModel :342,
trainDistillation :548, trainDeformPathomicModel :784; test mirrors
:1055-1720).  Thin re-export over the TPU-native trainers."""

from disentangled_multimodal_learning_tpu.train.trainers import (  # noqa: F401
    run_training,
    testBaselineModel,
    testDeformPathomicModel,
    testDistillation,
    testMultiScaleModel,
    testStudentsModel,
    testTeachersModel,
    trainDeformPathomicModel,
    trainDistillation,
    trainStudentsModel,
    trainTeachersModel,
)
from disentangled_multimodal_learning_tpu.train.losses import (  # noqa: F401
    distillation_loss,
    nll_surv_loss,
)
