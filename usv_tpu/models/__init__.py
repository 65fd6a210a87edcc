from usv_tpu.models.mlp import (
    MLP,
    SquashedGaussianActor,
    DoubleCritic,
    PpoActorCritic,
)
