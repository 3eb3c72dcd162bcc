#!/bin/sh
# Paper schedule for VGG-16 (reference train_pytorch_vgg16.sh): 10 epochs at
# lr 1e-3 then 4 epochs at 1e-4, resuming weights (never optimizer state).
set -e
python -m fasterrcnn_tpu --train --backbone=vgg16 --load-from=vgg16_caffe.pth \
  --epochs=10 --learning-rate=1e-3 --save-best-to=vgg16_tmp.msgpack "$@"
python -m fasterrcnn_tpu --train --backbone=vgg16 --load-from=vgg16_tmp.msgpack \
  --epochs=4 --learning-rate=1e-4 --save-best-to=vgg16_fasterrcnn.msgpack "$@"
