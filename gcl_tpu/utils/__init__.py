from .timer import AverageMeter, MinTimer, Timer
