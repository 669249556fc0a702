import torch


def accuracy(output, target, topk=(1,)):
    """Top-k accuracy in percent (timm.utils.accuracy semantics)."""
    maxk = max(topk)
    batch = target.size(0)
    _, pred = output.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(target.reshape(1, -1).expand_as(pred))
    return [correct[:k].reshape(-1).float().sum(0) * 100.0 / batch
            for k in topk]
