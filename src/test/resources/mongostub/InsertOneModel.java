package com.mongodb.client.model;

/** Real 4.x ctor erasure: InsertOneModel(T document) -> (Object). */
public final class InsertOneModel extends WriteModel {
    public final Object document;
    public InsertOneModel(Object document) { this.document = document; }
}
