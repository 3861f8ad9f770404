"""TRZSL workflow (reference methods/main_TRZSL.py:66-375).

Transductive zero-shot: labeled data covers seen classes (80/20 train/val),
the unlabeled pool covers unseen classes; evaluation reports unseen/seen
accuracy and their harmonic mean.
"""

from __future__ import annotations

import logging

from menghini_neurips23_tpu.data import (
    dataset_object,
    get_class_names,
    get_labeled_and_unlabeled_data,
    train_val_split,
)
from menghini_neurips23_tpu.runners import common

log = logging.getLogger(__name__)


def workflow(dataset_dir, obj_conf, runtime=None):
    dataset = obj_conf.DATASET_NAME
    classes, seen_classes, unseen_classes = get_class_names(
        dataset, dataset_dir, obj_conf.SPLIT_SEED
    )
    dict_classes = {
        "classes": classes,
        "seen_classes": seen_classes,
        "unseen_classes": unseen_classes,
    }
    data_folder = f"{dataset_dir}/{dataset}"
    log.info(
        "classes: %d (seen %d / unseen %d)",
        len(classes), len(seen_classes), len(unseen_classes),
    )

    labeled_data, unlabeled_data, test_data = get_labeled_and_unlabeled_data(
        dataset, data_folder, seen_classes, unseen_classes, classes
    )
    labeled_files, labeles = zip(*labeled_data)
    unseen_labeled_files, unseen_labeles = zip(*unlabeled_data)
    test_labeled_files, test_labeles = zip(*test_data)
    label_to_idx = {c: idx for idx, c in enumerate(classes)}

    train_files, train_labs, val_files, val_labs = train_val_split(
        labeled_files, labeles, obj_conf.ratio_train_val, obj_conf.validation_seed
    )

    DatasetObject = dataset_object(dataset)
    train_seen_dataset = DatasetObject(
        train_files, data_folder, train=True, labels=train_labs, label_map=label_to_idx
    )
    train_unseen_dataset = DatasetObject(
        unseen_labeled_files, data_folder, train=True, labels=None, label_map=label_to_idx
    )
    truncated_unseen = [f.split("/")[-1] for f in train_unseen_dataset.filepaths]
    val_seen_dataset = DatasetObject(
        val_files, data_folder, train=True, labels=val_labs, label_map=label_to_idx
    )
    test_dataset = DatasetObject(
        test_labeled_files, data_folder, train=False, labels=None, label_map=label_to_idx
    )

    model, method = common.build_strategy(
        obj_conf, label_to_idx, dict_classes, data_folder,
        unlabeled_files=truncated_unseen, runtime=runtime,
    )
    val_accuracy, optimal_prompt = common.run_strategy(
        model, method, train_seen_dataset, val_seen_dataset, train_unseen_dataset
    )
    log.info("best validation accuracy: %s", val_accuracy)
    return common.finish_workflow(
        obj_conf, model, optimal_prompt, test_dataset,
        test_labeled_files, test_labeles, dict_classes,
    )


def main(argv=None, env=None):
    return common.main_template(workflow, argv=argv, env=env)


if __name__ == "__main__":
    main()
