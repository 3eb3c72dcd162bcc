#!/bin/sh
# Fetch VOC2007 trainval+test and unpack into VOCdevkit/VOC2007
# (same dataset the reference trains on; reference download_dataset.sh).
set -e
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar
tar -xvf VOCtrainval_06-Nov-2007.tar
tar -xvf VOCtest_06-Nov-2007.tar
