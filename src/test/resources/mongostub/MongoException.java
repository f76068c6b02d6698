package com.mongodb;

public class MongoException extends RuntimeException {
    public MongoException(String message) { super(message); }
}
