"""Dataset factory: name -> imdb constructor registry.

Same registry surface as the reference (/root/reference/lib/datasets/
factory.py:20-52): voc_{2007,2012}_{train,val,trainval,test}[_diff] and the
coco_2014/2015 splits.
"""

from __future__ import annotations

__sets = {}


def _register():
    from tf_faster_rcnn_tpu.datasets.pascal_voc import pascal_voc

    for year in ['2007', '2012']:
        for split in ['train', 'val', 'trainval', 'test']:
            name = 'voc_{}_{}'.format(year, split)
            __sets[name] = (lambda split=split, year=year:
                            pascal_voc(split, year))
            __sets[name + '_diff'] = (
                lambda split=split, year=year:
                pascal_voc(split, year, use_diff=True))

    def _coco(split, year):
        from tf_faster_rcnn_tpu.datasets.coco import coco
        return coco(split, year)

    for year in ['2014']:
        for split in ['train', 'val', 'minival', 'valminusminival',
                      'trainval']:
            name = 'coco_{}_{}'.format(year, split)
            __sets[name] = (lambda split=split, year=year: _coco(split, year))
    for year in ['2015']:
        for split in ['test', 'test-dev']:
            name = 'coco_{}_{}'.format(year, split)
            __sets[name] = (lambda split=split, year=year: _coco(split, year))


_register()


def get_imdb(name):
    """Get an imdb by name."""
    if name not in __sets:
        raise KeyError('Unknown dataset: {}'.format(name))
    return __sets[name]()


def list_imdbs():
    """List all registered imdb names."""
    return list(__sets.keys())
