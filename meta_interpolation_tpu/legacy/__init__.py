"""Paper-exact legacy trainers (reference ``/root/reference/legacy/``).

The reference keeps standalone per-model scripts implementing the paper's
original algorithms with real torch optimizers and ``copy.deepcopy`` weight
juggling (legacy/train_sepconv.py:113-180 and siblings). Functionally:

  * **Reptile** — k inner Adamax steps on the support pairs, then move the
    meta-init toward the adapted weights:
    θ ← θ + ε (θ' − θ)   (:113-141)
  * **first-order MAML** — k inner Adamax steps, query-loss gradient at the
    adapted weights applied to the *base* weights via the outer optimizer
    (:145-180)

Both are trivial in the functional setting and are provided in
:mod:`.trainers` as scan-jittable single-batch steps.
"""
from .trainers import reptile_step, fomaml_step  # noqa: F401
