"""SSL workflow (reference methods/main_SSL.py:66-427).

All classes are both seen and unseen; N_LABEL few-shots per class form the
labeled set, the rest of the labeled pool becomes the "unlabeled" set; 80/20
train/val split on the few shots.
"""

from __future__ import annotations

import logging


from menghini_neurips23_tpu.data import (
    dataset_object,
    get_class_names,
    get_labeled_and_unlabeled_data,
    sample_few_shots,
    train_val_split,
)
from menghini_neurips23_tpu.runners import common

log = logging.getLogger(__name__)


def workflow(dataset_dir, obj_conf, runtime=None):
    dataset = obj_conf.DATASET_NAME
    classes, seen_classes, unseen_classes = get_class_names(
        dataset, dataset_dir, obj_conf.SPLIT_SEED
    )
    # SSL: no seen/unseen distinction (reference main_SSL.py:74-75)
    seen_classes = classes
    unseen_classes = classes
    dict_classes = {
        "classes": classes,
        "seen_classes": seen_classes,
        "unseen_classes": unseen_classes,
    }
    data_folder = f"{dataset_dir}/{dataset}"
    log.info("Number of classes: %d; data folder: %s", len(classes), data_folder)

    labeled_data, unlabeled_data, test_data = get_labeled_and_unlabeled_data(
        dataset, data_folder, seen_classes, unseen_classes, classes
    )
    labeled_files, labeles = zip(*labeled_data)
    test_labeled_files, test_labeles = zip(*test_data)
    label_to_idx = {c: idx for idx, c in enumerate(classes)}

    # Few-shot sampling (reference main_SSL.py:100-116)
    few_shots_files, few_shots_labs = sample_few_shots(
        labeled_files, labeles, classes, obj_conf.N_LABEL, obj_conf.validation_seed
    )
    # Remaining labeled pool becomes the unlabeled set (reference :119-124)
    few_set = set(few_shots_files)
    unseen_labeled_files = []
    unseen_labeles = []
    for idx, f in enumerate(labeled_files):
        if f not in few_set:
            unseen_labeled_files.append(f)
            unseen_labeles.append(labeles[idx])
    log.info(
        "shots: %d; unlabeled pool: %d", len(few_shots_labs), len(unseen_labeled_files)
    )

    train_files, train_labs, val_files, val_labs = train_val_split(
        few_shots_files, few_shots_labs, obj_conf.ratio_train_val, obj_conf.validation_seed
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
