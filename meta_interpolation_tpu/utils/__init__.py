from .meters import AverageMeter, init_losses, init_meters
