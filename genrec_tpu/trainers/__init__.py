"""Trainer entry points (parity: ``/root/reference/genrec/trainers/__init__.py:128-135``).

Each is an executable module:
``python -m genrec_tpu.trainers.<name>_trainer <config.gin> --split <split>``
for name in {rqvae, tiger, sasrec, hstu, lcrec, cobra}.
"""

TRAINERS = ["rqvae", "tiger", "sasrec", "hstu", "lcrec", "cobra"]
