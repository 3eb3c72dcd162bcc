#!/bin/sh
# ResNet-50 recipe (reference train_pytorch_resnet50.sh): torchvision
# IMAGENET1K_V1 initial weights, same two-phase schedule.
# Export the torchvision state dict first, e.g.:
#   python -c "import torchvision, torch; torch.save(
#     torchvision.models.resnet50(weights='IMAGENET1K_V1').state_dict(),
#     'resnet50_imagenet.pth')"
# bf16 is the gate dtype (see train_vgg16.sh).
set -e
python -m fasterrcnn_tpu --train --backbone=resnet50 --load-from=resnet50_imagenet.pth \
  --compute-dtype=bfloat16 --batch-size=8 \
  --epochs=10 --learning-rate=1e-3 --save-best-to=resnet50_tmp.msgpack "$@"
python -m fasterrcnn_tpu --train --backbone=resnet50 --load-from=resnet50_tmp.msgpack \
  --compute-dtype=bfloat16 --batch-size=8 \
  --epochs=4 --learning-rate=1e-4 --save-best-to=resnet50_fasterrcnn.msgpack "$@"
