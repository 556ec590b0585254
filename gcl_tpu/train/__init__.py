from .checkpoint import (dump_config_json, load_checkpoint, restore_into,
                         save_checkpoint)
from .steps import (StepConfig, TrainState, make_feature_extractor,
                    make_gcl_train_step, make_optimizer,
                    make_pair_train_step, make_val_step)
from .trainer import (AlignmentTrainer, ContrastiveLossTrainer,
                      FinestContrastiveLossTrainer,
                      HardestContrastiveLossTrainer,
                      HardestTripletLossTrainer, TripletLossTrainer,
                      get_trainer)
from .writer import SummaryWriter
