#!/bin/sh
# Fetch the Caffe-trained VGG-16 initial weights the reference trains from
# (reference download_models.sh). The importer in
# fasterrcnn_tpu/utils/checkpoint.py consumes this file directly.
set -e
curl -L https://www.dropbox.com/s/sr6nu0kxyjfquzy/vgg16_caffe.pth?dl=1 -o vgg16_caffe.pth
