from .common import (masked_mean, pair_isin, pdist_l2,
                     sample_without_replacement, sort_pairs,
                     square_distance)
from .gcl import (GCLLossConfig, GCLLossOut, SpatialNegFilter,
                  finest_contrastive_loss, intra_group_pairs,
                  location_circle_loss, location_contrastive_loss,
                  member_group_index)
from .pairs import (PairLossOut, TripletLossOut, contrastive_loss,
                    hardest_contrastive_loss, hardest_triplet_loss,
                    triplet_loss)
