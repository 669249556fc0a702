"""Minimal torchmetrics shim backed by sklearn, matching the semantics the
reference scripts rely on: multiclass AUROC (macro one-vs-rest) and
multiclass F1 honoring the ``average`` kwarg — torchmetrics' default is
micro (what `Step3_ACMIL:279`, `Step3_DTFD:243`, `Step3_MHIM:216` get),
while the generic trainer passes ``average='macro'`` explicitly
(`engine.py:213`)."""
import numpy as np
import torch
from sklearn.metrics import f1_score, roc_auc_score


class _Metric:
    def __init__(self, num_classes=2, task="multiclass", average="micro",
                 **kw):
        self.num_classes = num_classes
        self.average = average
        self._preds, self._targets = [], []

    def to(self, device):
        return self

    def __call__(self, preds, target):
        self._preds.append(preds.detach().cpu().numpy())
        self._targets.append(target.detach().cpu().numpy())

    def compute(self):
        p = np.concatenate(self._preds)
        t = np.concatenate(self._targets)
        return torch.tensor(self._value(p, t))


class AUROC(_Metric):
    def _value(self, p, t):
        if self.num_classes == 2:
            return roc_auc_score(t, p[:, 1])
        return roc_auc_score(t, p, multi_class="ovr", average="macro")


class F1Score(_Metric):
    def _value(self, p, t):
        return f1_score(t, p.argmax(axis=1), average=self.average)
