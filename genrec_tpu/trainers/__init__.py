"""Trainer entry points (parity: ``/root/reference/genrec/trainers/__init__.py:128-135``).

Each is an executable module:
``python -m genrec_tpu.trainers.<name>_trainer <config.gin> --split <split>``
for name in {rqvae, tiger, sasrec, hstu, lcrec, cobra, notellm}
(notellm is an extension: the reference wires no trainer for it).
"""

TRAINERS = ["rqvae", "tiger", "sasrec", "hstu", "lcrec", "cobra",
            "notellm"]
